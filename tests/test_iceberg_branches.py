"""Contract tests for the Iceberg production branches of sources/io.py.

No Iceberg runtime jar ships in this sandbox, so these branches cannot
execute for real — but their LOGIC (routing predicate, emitted SQL,
writeTo call order) is testable against a recorded fake session. This
turns the production path from dead code into code with a pinned
contract: if a refactor breaks the MERGE statement or the catalog
routing, these fail without any jar present.

Reference semantics being pinned: MERGE-on-key idempotent append
(ocr.py:96-103 409-on-duplicate), DELETE-based retention
(job_db.py:241-260), snapshot-replace overwrite.
"""

from docling_fast_server_spark.sources import io as io_mod


class _Conf:
    def __init__(self, catalog: str):
        self._catalog = catalog

    def get(self, key, default=""):
        if key == "spark.sql.catalog.local":
            return self._catalog
        return default


class _Writer:
    def __init__(self, log, path):
        self.log, self.path = log, path

    def append(self):
        self.log.append(("writeTo.append", self.path))

    def createOrReplace(self):
        self.log.append(("writeTo.createOrReplace", self.path))


class _FakeDF:
    def __init__(self, spark, n=7):
        self.sparkSession = spark
        self._n = n

    def writeTo(self, path):
        return _Writer(self.sparkSession.log, path)

    def createOrReplaceTempView(self, name):
        self.sparkSession.log.append(("tempview", name))
        self.sparkSession._views[name] = self

    def count(self):
        return self._n

    def filter(self, predicate):
        self.sparkSession.log.append(("filter", predicate))
        return _FakeDF(self.sparkSession, n=3)


class _Read:
    def __init__(self, spark):
        self._spark = spark

    def format(self, fmt):
        self._spark.log.append(("read.format", fmt))
        return self

    def load(self, path):
        self._spark.log.append(("read.load", path))
        return _FakeDF(self._spark)


class _Catalog:
    def __init__(self, spark):
        self._spark = spark

    def tableExists(self, path):
        self._spark.log.append(("tableExists", path))
        return True


class _FakeSpark:
    def __init__(self, iceberg=True):
        self.conf = _Conf(
            "org.apache.iceberg.spark.SparkCatalog" if iceberg else ""
        )
        self.log: list = []
        self._views: dict = {}
        self.read = _Read(self)
        self.catalog = _Catalog(self)

    def sql(self, stmt):
        self.log.append(("sql", " ".join(stmt.split())))
        return _FakeDF(self)

    def table(self, name):
        return self._views[name]


def test_routing_predicate():
    ice = _FakeSpark(iceberg=True)
    assert io_mod._has_iceberg(ice)
    assert not io_mod._has_iceberg(_FakeSpark(iceberg=False))
    # catalog table name -> iceberg write (absolute paths always take the
    # parquet fallback, jar or not — the `not path.startswith("/")` leg)
    io_mod.append_table(_FakeDF(ice), "local.db.docs")
    assert ("writeTo.append", "local.db.docs") in ice.log


def test_overwrite_routes_to_create_or_replace():
    ice = _FakeSpark()
    io_mod.overwrite_table(_FakeDF(ice), "local.db.docs")
    assert ice.log == [("writeTo.createOrReplace", "local.db.docs")]


def test_merge_append_emits_merge_into_on_key():
    ice = _FakeSpark()
    n = io_mod.merge_append_table(_FakeDF(ice, n=42), "local.db.docs", key="doc_id")
    assert n == 42
    sqls = [s for op, s in ice.log if op == "sql"]
    assert len(sqls) == 1
    stmt = sqls[0]
    assert stmt.startswith("MERGE INTO local.db.docs t USING merge_src_")
    assert "ON t.doc_id = s.doc_id" in stmt
    assert stmt.endswith("WHEN NOT MATCHED THEN INSERT *")
    # the source view was registered before the MERGE referenced it
    assert ice.log[0][0] == "tempview"


def test_retention_delete_emits_delete_where():
    ice = _FakeSpark()
    n = io_mod.retention_delete(ice, "local.db.jobs", "created_at < now() - INTERVAL 24 HOURS")
    assert n == 3  # the filtered count of the fake
    sqls = [s for op, s in ice.log if op == "sql"]
    assert sqls == [
        "DELETE FROM local.db.jobs WHERE created_at < now() - INTERVAL 24 HOURS"
    ]
    # read went through the iceberg reader, not parquet paths
    assert ("read.format", "iceberg") in ice.log


def test_table_exists_and_read_route_through_catalog():
    ice = _FakeSpark()
    assert io_mod.table_exists(ice, "local.db.docs")
    assert ("tableExists", "local.db.docs") in ice.log
    io_mod.read_table(ice, "local.db.docs")
    assert ("read.load", "local.db.docs") in ice.log
