"""Source connectors: paginated REST scan + binary payloads.

``rest`` implements the reference's front door (paginated occurrence API
scan) as a PySpark custom DataSource with partition-per-page and filter
pushdown; ``animaltrackingetls_spark.operators.multimodal`` covers the
binaryFile path; JDBC lives in ``animaltrackingetls_spark.io``.
"""

from .rest import (  # noqa: F401
    FixtureTransport,
    HttpTransport,
    PagedRestDataSource,
    fetch_all_pages,
    fetch_page_with_retry,
    transport_from_options,
)
