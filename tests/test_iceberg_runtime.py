"""OPTIONAL real-runtime Iceberg e2e: adopt / rollback / incremental read
against real Iceberg metadata.

Auto-skipped unless the environment provides the runtime (no jar ships in
this sandbox and there is no network for ivy):

- ``BEATS_SPARK_ICEBERG_PACKAGE`` — maven coordinate for
  ``spark.jars.packages`` (e.g. org.apache.iceberg:iceberg-spark-runtime-
  3.5_2.12:1.6.1), resolved from a warm ivy cache or a mirror, or
- ``BEATS_SPARK_ICEBERG_JAR`` — path to a local iceberg-spark-runtime jar.

The pure-python contract (SQL text, snapshot ordering, intent recovery,
range selection) is pinned jar-free in test_iceberg.py; this test proves
the same calls against a real catalog. It runs in a SUBPROCESS because the
catalog + jar configs must be set at session build time and the suite's
shared session must not be restarted.
"""

import os
import subprocess
import sys

import pytest

_PKG = os.environ.get("BEATS_SPARK_ICEBERG_PACKAGE")
_JAR = os.environ.get("BEATS_SPARK_ICEBERG_JAR")

_DRIVER = r"""
import sys, tempfile
sys.path.insert(0, sys.argv[1])
from beats_spark.session import get_spark
from beats_spark.iceberg import IcebergCatalog

conf = {
    "spark.sql.catalog.it": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.it.type": "hadoop",
    "spark.sql.catalog.it.warehouse": tempfile.mkdtemp(prefix="iceberg_wh_"),
}
if sys.argv[2] != "-":
    conf["spark.jars.packages"] = sys.argv[2]
if sys.argv[3] != "-":
    conf["spark.jars"] = sys.argv[3]
spark = get_spark("iceberg_e2e", master="local[2]", shuffle_partitions=2,
                  extra_conf=conf)
cat = IcebergCatalog(spark, catalog="it", namespace="beats")

df = lambda rows: spark.createDataFrame(rows, "k int, v string")
s1 = cat.append(df([(1, "a"), (2, "b"), (3, "c")]), "t", run_id="r1")
assert cat.read("t").count() == 3
s2 = cat.append(df([(4, "d"), (5, "e")]), "t", run_id="r2")
inc = cat.read_since("t", after_snapshot_id=s1.snapshot_id)
assert inc.count() == 2, inc.count()
assert sorted(r["k"] for r in inc.collect()) == [4, 5]

# metadata-only adoption of a staged dir + intent lifecycle
staged = tempfile.mkdtemp(prefix="iceberg_staged_")
df([(6, "f")]).coalesce(1).write.mode("overwrite").parquet(staged)
s3 = cat.adopt_directory(staged, "t", run_id="r3")
assert s3.run_id == "r3"
assert cat.read("t").count() == 6
snaps = cat.snapshots("t")
assert [s.run_id for s in snaps][-3:] == ["r1", "r2", "r3"], snaps

# rollback the adopted run, then the written run
cat.rollback_run("r3")
assert cat.read("t").count() == 5
cat.rollback_run("r2")
assert cat.read("t").count() == 3
assert not cat.incomplete_runs(lineage_table="t")
print("ICEBERG_E2E_OK")
"""


@pytest.mark.skipif(
    not (_PKG or _JAR),
    reason="no Iceberg runtime: set BEATS_SPARK_ICEBERG_PACKAGE (maven "
           "coordinate) or BEATS_SPARK_ICEBERG_JAR (local jar path)",
)
def test_iceberg_runtime_e2e():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, repo, _PKG or "-", _JAR or "-"],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ICEBERG_E2E_OK" in proc.stdout
