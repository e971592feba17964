"""mallarddv_spark — a PySpark-native Data Vault 2.0 analytics engine.

A from-scratch rebuild of the capabilities of the reference system
(``panda-blue/mallarddv``, a metadata-driven Data Vault warehouse builder on
embedded DuckDB — see ``/root/reference``) re-expressed in idiomatic PySpark:

* metadata-driven Data Vault model (hubs / links / satellites / staging)
* SHA1 hash-key & hash-diff derivation as Catalyst expressions
* idempotent anti-join loads, SCD2-style satellite history with tombstones
* current-value views, run ledger, file ingestion flows
* plus large-scale extensions the reference lacks: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), similarity search over embeddings, text analysis
  and multimodal-column plumbing — all designed for multi-TB Spark clusters.

Everything is declared through the DataFrame / Spark SQL API so Catalyst and
AQE choose physical plans (broadcast vs shuffle joins, skew handling,
partition pruning).
"""

from mallarddv_spark.api import MallardSparkVault
from mallarddv_spark.exceptions import (
    DVConfigurationError,
    DVEntityError,
    DVETLError,
    DVException,
    DVMetadataError,
    DVSQLError,
)
from mallarddv_spark.logging_utils import configure_logging, get_logger
from mallarddv_spark.session import get_spark

__all__ = [
    "MallardSparkVault",
    "get_spark",
    "configure_logging",
    "get_logger",
    "DVException",
    "DVSQLError",
    "DVMetadataError",
    "DVEntityError",
    "DVConfigurationError",
    "DVETLError",
]
__version__ = "0.1.0"
