"""End-to-end evidence for the north-star launch mode:
``spark-submit --py-files graphlab_spark.zip driver.py pagerank ...``.

The reference's deployment surface is ``mpiexec -n <N> ./pagerank
--graph=... --engine=synchronous`` (``toolkits/graph_analytics/
pagerank.cpp:159-230``); ours is spark-submit shipping the package as a
zip to the executors.  This test actually shells out to spark-submit:
the package is zipped, shipped via --py-files, the driver reuses the
submitted session (``cli._get_session`` takes the active session), and
the parquet output must match an in-process run bit-for-bit on ranks
rounded to 1e-9.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

DRIVER = """\
import sys
from pyspark.sql import SparkSession

# Under spark-submit the master/conf come from the submit command line;
# the cli reuses this active session instead of building its own.
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from graphlab_spark.cli import main
sys.exit(main(sys.argv[1:]))
"""


def _build_pyfiles_zip(path: str) -> None:
    pkg = os.path.join(REPO, "graphlab_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
@pytest.mark.parametrize(
    "master",
    [
        "local[4]",
        # Multi-executor launch: 2 SEPARATE executor JVMs (own heaps /
        # BlockManagers) that each fetch the --py-files zip from the
        # driver's file server — the literal multi-executor
        # ``spark-submit --py-files`` deployment shape, minus only the
        # physical network between worker hosts.
        "local-cluster[2,2,1024]",
    ],
)
def test_spark_submit_pyfiles_pagerank(spark, tmp_path, master):
    zip_path = str(tmp_path / "graphlab_spark.zip")
    _build_pyfiles_zip(zip_path)
    driver_path = tmp_path / "driver.py"
    driver_path.write_text(DRIVER)
    out_dir = str(tmp_path / "ranks_submitted")

    events = os.path.join(SF_DIR, "events.parquet")
    cmd = [
        SPARK_SUBMIT,
        "--master", master,
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.executor.memory=1024m",
        "--py-files", zip_path,
        str(driver_path),
        "pagerank", "--events", events,
        "--iterations", "2", "--output", out_dir,
    ]
    env = dict(os.environ)
    # The zip must be the ONLY way the subprocess can see the package —
    # strip the repo from any inherited import path.
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=420, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert metrics, proc.stdout
    payload = json.loads(metrics[-1])
    assert payload["algo"] == "pagerank"
    assert payload["supersteps"] == 2
    assert payload["rows"] > 0

    # Parity: the submitted run's parquet == an in-process run.
    from graphlab_spark import EdgeGraph
    from graphlab_spark.algos.pagerank import pagerank
    from graphlab_spark.sources.events import edges_from_events

    g = EdgeGraph(edges_from_events(spark.read.parquet(events)),
                  num_edge_partitions=8)
    expected = pagerank(g, fixed_supersteps=2, resume=False).state
    got = spark.read.parquet(out_dir)
    assert got.count() == payload["rows"] == expected.count()
    diff = (
        expected.alias("e")
        .join(got.alias("g"), "id", "full")
        .where(
            F.col("e.rank").isNull()
            | F.col("g.rank").isNull()
            | (F.abs(F.col("e.rank") - F.col("g.rank")) > 1e-9)
        )
        .count()
    )
    assert diff == 0
    g.unpersist()
