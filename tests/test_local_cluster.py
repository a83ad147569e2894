"""local-cluster smoke test (r9 verdict ask #6).

``local-cluster[2,4,4096]`` runs a real standalone master + 2 executor
JVMs (4 cores / 4 GiB each) on this host — the cheapest topology that
breaks every accidental dependency on driver and executors sharing one
JVM: executor Python workers get their own cwd/sys.path (this test's
first run caught exactly that — cloudpickled closures referencing the
package crashed with ModuleNotFoundError until session._ship_package
started addPyFile-ing the package), shuffle goes over real
BlockManager transfers, and the transformWithState driver-worker
PYTHONPATH seeding (the vendored minipb protobuf shim) must survive
process boundaries.

The representative set below is oracle-checked (driver_sim, duckdb
hash compare) — not just "runs without crashing":

- q01_pricing_summary: scan-heavy whole-stage-codegen aggregation
- q03_shipping_priority: multi-join + top-k (broadcast + shuffle)
- q_winnow_fingerprints: Arrow mapInPandas (numpy in executor workers)
- q_kmeans_embeddings: iterative training, per-round closure shipping
- q_audio_segments_flac: pure-Python codec modules (flaccodec) imported
- q_quality_classifier_weights: iterative GD, literal weight arrays per round
  inside executor workers via the shipped package zip
- q_stream_window_tumbling: streaming state store across executors
- q_stream_state_v2: transformWithState + vendored-protobuf seeding
  (the riskiest single-JVM assumption per the r9 verdict)

Runs in a SUBPROCESS so the shared local[*] test session is untouched.
Skipped (with the reason) only if the standalone cluster itself cannot
start in this environment — query failures are real failures.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

# r15 verify-window tiering: staged-batch streaming / TWS / fuzz /
# cluster tests run in the slow tier (pytest.ini; -m slow at round close)
pytestmark = pytest.mark.slow




_QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q_winnow_fingerprints",
    "q_kmeans_embeddings",
    "q_audio_segments_flac",  # r10: pure-Python codec closures must ship
    "q_quality_classifier_weights",  # r10: GD training loop, literal-array closures
    "q_stream_window_tumbling",
    "q_stream_state_v2",
    # r11: Python DataSource reader/writer classes + codec closures must
    # ship to executor-side Python workers (warccodec, tarfile members,
    # imagecodec PNG decode inside the wds multimodal UDFs)
    "q_warc_extract",
    "q_wds_multimodal",
]

_CLUSTER_START_FAILURES = (
    "Could not bind",
    "Address already in use",
    "Failed to connect to master",
    "Master removed our application",
)


def test_driver_contract_on_local_cluster(sf_dir):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["SPARK_GRAFT_MASTER"] = "local-cluster[2,4,4096]"
    # 2 executors x 4 GiB live beside the driver JVM — don't also ask
    # for the 24g local-mode driver heap.
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "scripts", "driver_sim.py"),
            "--sf",
            "/root/testdata/sf0.001",
            "--only",
            ",".join(_QUERIES),
        ],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=840,
    )
    out = (proc.stdout + proc.stderr).replace("\r", "\n")
    matched = [q for q in _QUERIES if f"{q}:" in out and "MATCH" in
               next(line for line in out.splitlines() if f"{q}:" in line)]
    if proc.returncode != 0 and not matched:
        for marker in _CLUSTER_START_FAILURES:
            if marker in out:
                pytest.skip(
                    f"standalone cluster unavailable here ({marker!r}) — "
                    "see tests/test_local_cluster.py docstring"
                )
    assert proc.returncode == 0, out[-4000:]
    for q in _QUERIES:
        line = next((ln for ln in out.splitlines() if ln.startswith(f"{q}:")), "")
        assert "MATCH" in line and "MISMATCH" not in line, (q, line, out[-2000:])
