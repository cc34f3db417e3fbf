"""Stream-stream join state boundedness: 10 time-sliced files -> 10 micro-batches; the watermark must evict. Results recorded in SCALING.md."""
import glob, os, tempfile
from pyspark.sql import functions as F
from animaltrackingetls_spark.session import get_spark
from animaltrackingetls_spark.io import load_table
from animaltrackingetls_spark.streaming import stream_stream_join

spark = get_spark(shuffle_partitions=8,
                  extra_conf={'spark.ui.showConsoleProgress': 'false'})
ev = load_table(spark, "/root/testdata/sf0.1", "events")
d = tempfile.mkdtemp()
src = f"{d}/ev"
# 10 contiguous time slices; write one file per slice with ordered names
ev.withColumn("slice", F.ntile(10).over(
    __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("ts"))
).write.partitionBy("slice").mode("overwrite").parquet(src)
os.makedirs(f"{d}/flat")
for i in range(1, 11):
    fs = glob.glob(f"{src}/slice={i}/*.parquet")
    assert len(fs) == 1  # the experiment depends on one file per slice
    # name files so discovery order == time order
    os.rename(fs[0], f"{d}/flat/{i:04d}.parquet")
    # ensure mtime order matches too
    os.utime(f"{d}/flat/{i:04d}.parquet", (i * 1000, i * 1000))

def run(watermark):
    base = (spark.readStream.schema(spark.read.parquet(f"{d}/flat").schema)
            .option("maxFilesPerTrigger", 1).parquet(f"{d}/flat"))
    l = base.filter(F.col("event_type") == "signup").select("event_id", "ts", "user_id")
    r = base.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("event_id_r"), F.col("ts").alias("ts_r"), "user_id")
    pairs = stream_stream_join(l, r, max_gap_seconds=3600, watermark=watermark)
    q = (pairs.writeStream.format("memory")
         .queryName(f"p{abs(hash(watermark))}")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(400)
    peak, out = 0, 0
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            peak = max(peak, so.get("numRowsTotal", 0))
    out = spark.table(f"p{abs(hash(watermark))}").count()
    return peak, out

print("2h watermark  -> peak state, output:", run("2 hours"))
print("30d watermark -> peak state, output:", run("720 hours"))
