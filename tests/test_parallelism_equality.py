"""Two-parallelism-level equality (SURVEY §5): identical results at
num_cpus=2 and num_cpus=8 in fresh Ray sessions — the sandbox evidence for
the north rule's N vs 4N cluster-size determinism requirement."""

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=%(ncpu)d, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd
from raygeo.fixtures import FIXTURE_GRID, ensure_fixtures
from raygeo.ops.ingest import ingest
d = ensure_fixtures(0.001)
images = rd.read_parquet(f"{d}/images.parquet",
                         columns=["image_id", "bytes", "w", "h"])
rows = ingest(images, FIXTURE_GRID).to_pandas()
rows = rows[["tile_id", "tx", "ty", "n_frags", "n_valid_px", "pix_sum"]]
rows = rows.sort_values("tile_id").reset_index(drop=True)
print(json.dumps(rows.to_dict("records")))
ray.shutdown()
"""


def _run(ncpu: int):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": repo, "ncpu": ncpu}],
        capture_output=True, text=True, check=True, cwd=repo,
        env=dict(os.environ, RAY_ADDRESS="local"),
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def test_same_tiles_at_2_and_8_cpus(fixtures_sf0001):
    r2 = _run(2)
    r8 = _run(8)
    assert r2 == r8
    assert len(r2) > 0
