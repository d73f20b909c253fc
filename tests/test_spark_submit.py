"""The packaged deployment flow, end-to-end and out-of-process.

The north rule ships the engine as a ``spark-submit --py-files`` package
(reference analog: the assembled app jar + wrapper scripts of
pfa-spark/Readme.txt:13-52).  The in-process CLI tests cannot prove that
flow: they import ``esa_pfa_spark`` from the repo checkout.  This test
builds the zip with ``cli package``, then launches REAL ``spark-submit``
subprocesses whose only route to the engine is the ``--py-files`` zip
(PYTHONPATH scrubbed, cwd outside the repo), runs synth + the flagship
feature build, and checks the imports actually resolved into the zip and
the output parquet + resume manifest are sound.

Skips cleanly when no spark-submit binary is available.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

LAUNCHER = """\
import sys
import esa_pfa_spark
print("ESA_PFA_ORIGIN=" + esa_pfa_spark.__file__)
from esa_pfa_spark.cli import main
main(sys.argv[1:])
"""


def _spark_submit() -> str | None:
    # the pyspark-bundled binary is guaranteed version-consistent with the
    # library the workers will import; PATH is the fallback
    try:
        import pyspark

        bundled = Path(pyspark.__file__).parent / "bin" / "spark-submit"
        if bundled.exists():
            return str(bundled)
    except ImportError:
        pass
    return shutil.which("spark-submit")


SUBMIT = _spark_submit()


@pytest.mark.skipif(SUBMIT is None, reason="no spark-submit binary")
def test_py_files_package_flow(tmp_path):
    from esa_pfa_spark import cli

    zip_path = tmp_path / "esa_pfa_spark.zip"
    cli.main(["package", "--out", str(zip_path)])
    assert zip_path.stat().st_size > 10_000

    launcher = tmp_path / "launch.py"
    launcher.write_text(LAUNCHER)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "2"
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

    def submit(*args: str) -> str:
        proc = subprocess.run(
            [
                SUBMIT,
                "--master", "local[2]",
                "--py-files", str(zip_path),
                str(launcher), *args,
            ],
            cwd=str(tmp_path),  # repo checkout must NOT be importable
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        return proc.stdout

    tokens = tmp_path / "tokens"
    out1 = submit(
        "synth", "--entities", "30", "--mean-obs", "6", "--mean-tok", "10",
        "--out", str(tokens),
    )
    # the engine import must have come from the --py-files zip, not a
    # checkout that leaked onto the path
    origin = [l for l in out1.splitlines() if l.startswith("ESA_PFA_ORIGIN=")]
    assert origin and ".zip" in origin[0], out1

    features = tmp_path / "features"
    submit(
        "run", "--tokens", str(tokens), "--probes", str(tokens) + "_probes",
        "--out", str(features), "--resume", "--partitions", "2",
    )

    import pyarrow.parquet as pq

    part_files = sorted(features.rglob("*.parquet"))
    assert part_files, f"no parquet written under {features}"
    tbl = pq.read_table([str(p) for p in part_files])
    assert tbl.num_rows > 0
    cols = set(tbl.column_names)
    assert {"entity_id", "query_ts"} <= cols, cols

    manifest = features / "manifest.jsonl"
    assert manifest.exists()
    lines = manifest.read_text().splitlines()
    assert len(lines) == 2  # one lineage record per partition
