"""MongoDB source catalog — the reference's native source (index.js:99-108,
198, 356), via the official MongoDB Spark connector.

The connector jar (``org.mongodb.spark:mongo-spark-connector``) is not in
this container, so this module is import-safe and fails with a clear error
only when actually used without the connector on the classpath. The Spark
mapping replaces the reference's skip/limit pagination (index.js:186-198 —
unstable under concurrent writes, SURVEY.md §4.3.1) with the connector's
``partitioner`` — snapshot-consistent splits sized by
``partitioner.options.partition.size.mb`` instead of ``querylimit`` row
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from node_mongo2influx_spark.sources.catalog import Catalog


def _connection_uri(
    hostname: str = "localhost",
    port: int = 27017,
    user: str | None = None,
    password: str | None = None,
) -> str:
    from urllib.parse import quote_plus

    if user:
        cred = quote_plus(user)
        if password is not None:
            cred += f":{quote_plus(password)}"
        auth = f"{cred}@"
    else:
        auth = ""
    return f"mongodb://{auth}{hostname}:{port}/"


class MongoCatalog(Catalog):
    """Enumerate and read all collections of one MongoDB database.

    Collection discovery uses pymongo when available (the driver-side
    analogue of ``mongodb.collections()``, index.js:356) or an explicit
    ``collections`` list; reads go through the Spark connector so scans are
    partitioned and predicate/projection pushdown reaches the server.
    """

    def __init__(
        self,
        spark: SparkSession,
        database: str,
        hostname: str = "localhost",
        port: int = 27017,
        user: str | None = None,
        password: str | None = None,
        collections: list[str] | None = None,
        partition_size_mb: int = 64,
    ) -> None:
        super().__init__(spark)
        self.database = database
        self.uri = _connection_uri(hostname, port, user, password)
        self._collections = collections
        self.partition_size_mb = partition_size_mb

    def table_names(self) -> list[str]:
        if self._collections is not None:
            return list(self._collections)
        try:
            import pymongo  # type: ignore[import-not-found]
        except ImportError as exc:  # pragma: no cover - env without pymongo
            raise RuntimeError(
                "collection discovery needs pymongo (or pass collections=[...])"
            ) from exc
        client = pymongo.MongoClient(self.uri)
        try:
            return sorted(client[self.database].list_collection_names())
        finally:
            client.close()

    def read(self, name: str) -> DataFrame:
        return (
            self.spark.read.format("mongodb")
            .option("connection.uri", self.uri)
            .option("database", self.database)
            .option("collection", name)
            # SamplePartitioner: snapshot-consistent ranged splits — the
            # correct replacement for skip/limit paging (index.js:198).
            .option(
                "partitioner",
                "com.mongodb.spark.sql.connector.read.partitioner.SamplePartitioner",
            )
            .option(
                "partitioner.options.partition.size.mb", str(self.partition_size_mb)
            )
            .load()
        )
