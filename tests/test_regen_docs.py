"""regen_bench_docs must render BOTH documents from any artifact shape —
a reduced-run artifact (sections disabled) gets explicit "not measured"
lines, never a traceback after one doc was already rewritten (the
two-windows-two-stories skew the script exists to prevent)."""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def regen():
    spec = importlib.util.spec_from_file_location(
        "regen_bench_docs", os.path.join(REPO, "scripts", "regen_bench_docs.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_full_artifact_renders(regen):
    with open(os.path.join(REPO, "bench_result.json")) as f:
        d = json.load(f)
    bench = regen.bench_md(d, "test-window")
    base = regen.baseline_section(d, "test-window", 5, 400, 55)
    assert "test-window" in bench and "test-window" in base
    assert "## Index build" in bench
    assert "(400-test suite)" in base


def test_stripped_artifact_renders_not_measured_lines(regen):
    d = {"metric": "index_build_plus_queryset_sec", "value": 1.0, "sf": 0.001}
    bench = regen.bench_md(d, "w")
    assert "Build: not measured in this window." in bench
    assert "Query latency: not measured in this window." in bench
    base = regen.baseline_section(d, "w", 5, None, 55)
    assert "not measured in this window" in base
    assert "suite count not collected this run" in base
    assert "0-test suite" not in base


def test_empty_scaling_dict_is_skipped(regen):
    # scaling present but carrying no localN keys (e.g. aborted legs)
    d = {
        "value": 1.0,
        "sf": 0.001,
        "scaling": {"pair_efficiencies": []},
        "queries": {"q": 0.5},
        "queries_warm": {"q": 0.4},
        "query_p50_sec": 0.5,
        "query_p50_warm_sec": 0.4,
    }
    bench = regen.bench_md(d, "w")
    assert "## Scaling" not in bench
    assert "| q | 0.500 | 0.400" in bench


def test_errored_sections_render_stub_not_keyerror(regen):
    """bench.py stores {'error': ...} (possibly with partial legs) when a
    section crashes — the regen must render an explicit errored line, not
    KeyError mid-render (which leaves BOTH docs stale)."""
    with open(os.path.join(REPO, "bench_result.json")) as f:
        d = json.load(f)
    for k in ("collection", "xl", "dataops", "embeddings", "codec_ab", "merge"):
        d[k] = {"enabled": True, "error": "boom"}
    bench = regen.bench_md(d, "w")
    assert bench.count("errored in this window: boom") >= 4
    base = regen.baseline_section(d, "w", 5, None, 55)
    assert "boom" not in base  # baseline falls back to not-measured lines
    assert "Merge: not measured in this window" in base


def test_cached_sections_carry_cached_marker(regen):
    """Optional sections re-rendered from the side-file cache must say so —
    attributing an old window's numbers to the current one is the
    two-windows drift in miniature."""
    with open(os.path.join(REPO, "bench_result.json")) as f:
        d = json.load(f)
    for k in ("xl", "dataops", "embeddings", "codec_ab"):
        if isinstance(d.get(k), dict) and d[k].get("enabled"):
            d[k]["cached"] = True
    bench = regen.bench_md(d, "w")
    assert "cached from an earlier full window" in bench


def test_round_free_header_when_no_round_given(regen):
    with open(os.path.join(REPO, "bench_result.json")) as f:
        d = json.load(f)
    base = regen.baseline_section(d, "w", None, None, 55)
    assert base.startswith("## Measured status")
    assert "Round-" not in base.splitlines()[0]
