"""Demo notebook smoke test (VERDICT r1 task 5).

The committed examples/Demo_InfectionStates.ipynb ships fully executed on
real TPU hardware with the reference demo's workload shapes. CI re-executes
it end-to-end with tiny shapes (ODELIB_DEMO_FAST) on CPU to guard against
API drift breaking the executable spec.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NB = os.path.join(REPO, "examples", "Demo_InfectionStates.ipynb")


def test_committed_notebook_is_executed():
    with open(NB) as f:
        nb = json.load(f)
    code = [c for c in nb["cells"] if c["cell_type"] == "code"]
    with_out = [c for c in code if c.get("outputs")]
    errors = [o for c in code for o in c.get("outputs", [])
              if o.get("output_type") == "error"]
    images = [o for c in code for o in c.get("outputs", [])
              if "image/png" in o.get("data", {})]
    assert not errors
    assert len(with_out) >= 20, "committed notebook must ship executed"
    assert len(images) >= 10, "plots must be rendered in the committed nb"


@pytest.mark.slow
@pytest.mark.slow
def test_notebook_reexecutes(tmp_path):
    out = tmp_path / "demo.ipynb"
    env = dict(os.environ)
    env["ODELIB_DEMO_FAST"] = "1"
    env["ODELIB_DEMO_CPU"] = "1"
    proc = subprocess.run(
        [sys.executable, "-m", "jupyter", "nbconvert", "--to", "notebook",
         "--execute", NB, "--output", str(out)],
        env=env, cwd=os.path.join(REPO, "examples"),
        capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(out) as f:
        nb = json.load(f)
    errors = [o for c in nb["cells"] for o in c.get("outputs", [])
              if o.get("output_type") == "error"]
    assert not errors
