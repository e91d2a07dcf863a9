"""Smoke tests for the repo's debugging tools (the reference's analogous
affordance is the per-sample slice dump at decoder.rs:128-140)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def test_dump_mb_state_scalar_and_native(tmp_path):
    clip = os.path.join(HERE, "conformance", "intra_only.264")
    outs = {}
    for path in ("scalar", "native"):
        out = tmp_path / path
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "dump_mb_state.py"),
             clip, "--path", path, "--out", str(out),
             "--mbs", "8", "--frames", "2"],
            capture_output=True, text=True, cwd=REPO, timeout=300)
        assert r.returncode == 0, r.stderr
        files = sorted(os.listdir(out))
        assert files, "no dump files written"
        outs[path] = {f: (out / f).read_text() for f in files}
    # the two paths must produce identical normalized dumps on a stream
    # both decode bit-exactly — this is the property that makes the tool
    # a bisection instrument
    assert set(outs["scalar"]) == set(outs["native"])
    for f in outs["scalar"]:
        s = outs["scalar"][f].replace("path=scalar", "path=X")
        n = outs["native"][f].replace("path=native", "path=X")
        assert s.splitlines()[2:] == n.splitlines()[2:], f
