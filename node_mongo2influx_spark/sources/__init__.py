"""Sources: catalog enumeration and format readers."""

from node_mongo2influx_spark.sources.catalog import Catalog, DirectoryCatalog

__all__ = ["Catalog", "DirectoryCatalog"]
