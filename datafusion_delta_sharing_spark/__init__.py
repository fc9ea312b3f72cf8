"""datafusion_delta_sharing_spark — a PySpark-native analytics engine with the
capabilities of the ``tdikland/datafusion-delta-sharing`` reference crate.

The reference is an integration crate that plugs the Delta Sharing REST
protocol into DataFusion as a TableProvider + catalog, delegating all
relational processing to DataFusion (``/root/reference/src/lib.rs:16-21``).
Here, Spark SQL / Catalyst plays DataFusion's role: this package implements
the Python-native connector layer (profile, securable naming, REST client,
predicate hints, distributed parquet-over-HTTP reader, view-based catalog)
and exposes the full Spark SQL surface over the shared tables.

Layout:
    profile.py     -- connection profile + bearer auth  (reference src/profile.rs)
    securable.py   -- share/schema/table naming          (reference src/securable.rs)
    client.py      -- Delta Sharing REST client          (reference src/client/)
    plans/         -- predicate IR -> jsonPredicateHints (reference src/datasource/expr.rs)
    sources/       -- schema translation + DataFrame reader (reference src/datasource/)
    catalog.py     -- share catalog -> Spark views       (reference src/catalog/)
    operators/     -- dedup / similarity / top-k operators (extensions)
    functions/     -- text analysis, vector math helpers   (extensions)
    streaming/     -- structured-streaming operators       (extensions)
"""

from datafusion_delta_sharing_spark.profile import Profile
from datafusion_delta_sharing_spark.securable import Share, Schema, Table
from datafusion_delta_sharing_spark.client import DeltaSharingClient
from datafusion_delta_sharing_spark.sources.reader import DeltaSharingReader
from datafusion_delta_sharing_spark.catalog import DeltaSharingCatalog

__version__ = "0.1.0"

__all__ = [
    "Profile",
    "Share",
    "Schema",
    "Table",
    "DeltaSharingClient",
    "DeltaSharingReader",
    "DeltaSharingCatalog",
]
