"""Text analysis: counts, ratios, language ID, fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from animaltrackingetls_spark.operators import textstats


def test_quality_columns(spark):
    df = spark.createDataFrame([(1, "The cat  and the dog!")], "doc_id long, text string")
    row = textstats.quality_columns(df).collect()[0]
    assert row.n_tokens == 5
    assert row.n_chars_m == 21
    # stopwords among [the, cat, and, the, dog!]: the, and, the → 3/5
    assert abs(row.stopword_ratio - 0.6) < 1e-12
    # non [A-Za-z ] chars: '!' and one of the double spaces count as space → 20/21
    assert abs(row.alpha_ratio - 20 / 21) < 1e-12


def test_language_id_languages(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in town"),
            (2, "el perro y la casa de los amigos"),
            (3, "le chat et les amis des villes"),
            (4, "der hund und das haus ist nicht hier"),
            (5, "你好世界"),
            (6, "zxcv qwer asdf 12345"),
            (7, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.predicted_lang for r in textstats.language_id(df).collect()}
    assert out[1] == "en" and out[2] == "es" and out[3] == "fr" and out[4] == "de"
    assert out[5] == "zh"
    assert out[6] == "und"  # zero marker hits must NOT default to en
    assert out[7] == "und"


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abc"), (3, "x")], "doc_id long, text string")
    rows = {r.doc_id: (r.md5_fp, r.xx64_fp) for r in textstats.fingerprint(df).collect()}
    assert rows[1] == rows[2] != rows[3]
    assert rows[1][0] == "900150983cd24fb0d6963f7d28e17f72"  # md5('abc')


def test_tokens_are_lowercased_whitespace_split(spark):
    df = spark.createDataFrame([("Foo  BAR\tbaz",)], "t string")
    out = df.select(textstats.tokens(F.col("t")).alias("tk")).collect()[0].tk
    assert out == ["foo", "bar", "baz"]
