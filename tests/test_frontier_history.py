"""frontier.py <-> BENCH_HISTORY.jsonl consistency (VERDICT r4 weak #5 / #5).

The frontier table (iterative_inference_segm_tpu/frontier.py) is the ONE
checked-in source for every bench JSON line's throughput/accuracy summary —
but the table itself is hand-updated after each measurement. This test
closes the loop: every frontier entry must agree (within a small tolerance)
with the NEWEST matching measurement in BENCH_HISTORY.jsonl, so a stale or
fat-fingered frontier number fails CI the round after the measurement moves.

Matching is on the self-describing metric string bench.py writes
(bench.py cfg_bits, VERDICT r2 #9): the parenthesized config is parsed into
(dtype, engine, extra-flag set) and compared exactly — e.g. the fast line is
bf16/half with extras {fc=512, enc=stride} and nothing else, so it can never
be confused with the quarter-composed line (which adds sp=2). ``preset`` is
ignored when comparing extras because --preset fast prints its implied flags
anyway.

No TPU needed: this reads the committed history file only.
"""

import json
import os
import re

import pytest

from iterative_inference_segm_tpu.frontier import FRONTIER

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HISTORY = os.path.join(REPO, "BENCH_HISTORY.jsonl")

# Relative tolerance between a frontier entry and the newest matching
# history line. Run-to-run harness variance is ±0.3% on an idle host
# (bench.py); 1.5% also absorbs the busy-host skew of a mid-round line.
TOL = 0.015

# frontier name -> the bench.py metric-string configuration that measures it.
# ``extras`` is the EXACT set of non-default cfg_bits (minus ``preset``).
MATCHERS = {
    "parity flagship": ("bf16", "half", {}),
    "fast line": ("bf16", "half", {"fc": "512", "enc": "stride"}),
    "quarter parity-topology": ("bf16", "half", {"sp": "2"}),
    "quarter composed": ("bf16", "half", {"fc": "512", "enc": "stride", "sp": "2"}),
    "general bf16": ("bf16", "general", {}),
    "general strict-f32": ("f32", "general", {}),
    "mirror parity-arch": ("bf16", "general", {"arch": "mirror"}),
    "energy half": ("bf16", "half", {"mode": "energy"}),
    "energy quarter": ("bf16", "half", {"sp": "2", "mode": "energy"}),
}

_METRIC_RE = re.compile(
    r"^images/sec/chip \(FCN-8 \+ (?P<steps>\d+)-step DAE refine, "
    r"(?P<res>\d+x\d+), (?P<dtype>\w+), batch=(?P<batch>\d+), "
    r"engine=(?P<engine>\w+), tail=(?P<tail>\w+)(?P<extras>(, [^,)]+)*)\)$"
)


def _parse_metric(metric):
    m = _METRIC_RE.match(metric)
    if m is None:
        return None
    extras = {}
    for tok in m.group("extras").split(", ")[1:]:
        k, _, v = tok.partition("=")
        extras[k] = v
    return {
        "steps": m.group("steps"),
        "res": m.group("res"),
        "dtype": m.group("dtype"),
        "batch": m.group("batch"),
        "engine": m.group("engine"),
        "tail": m.group("tail"),
        "extras": extras,
    }


def _history():
    with open(HISTORY) as f:
        return [json.loads(line) for line in f if line.strip()]


def _newest_match(records, dtype, engine, extras):
    newest = None
    for rec in records:
        cfg = _parse_metric(rec.get("metric", ""))
        if cfg is None or rec.get("value") is None:
            continue
        if (cfg["steps"], cfg["res"], cfg["batch"], cfg["tail"]) != (
            "5", "360x480", "128", "full",
        ):
            continue
        got_extras = {k: v for k, v in cfg["extras"].items() if k != "preset"}
        if (cfg["dtype"], cfg["engine"], got_extras) == (dtype, engine, extras):
            newest = rec  # file order is append order: keep the last
    return newest


def test_metric_parser_round_trips_known_lines():
    flat = _parse_metric(
        "images/sec/chip (FCN-8 + 5-step DAE refine, 360x480, bf16, "
        "batch=128, engine=half, tail=full)"
    )
    assert flat is not None and flat["extras"] == {}
    composed = _parse_metric(
        "images/sec/chip (FCN-8 + 5-step DAE refine, 360x480, bf16, "
        "batch=128, engine=half, tail=full, fc=512, enc=stride, sp=2, "
        "preset=fast)"
    )
    assert composed is not None
    assert composed["extras"] == {"fc": "512", "enc": "stride", "sp": "2",
                                  "preset": "fast"}


@pytest.mark.parametrize("name", [row[0] for row in FRONTIER])
def test_frontier_entry_matches_newest_history_line(name):
    row = next(r for r in FRONTIER if r[0] == name)
    assert name in MATCHERS, (
        f"frontier entry {name!r} has no MATCHERS rule — add one so the "
        "entry stays tied to BENCH_HISTORY (every frontier row must be "
        "re-measurable by a bench.py invocation)"
    )
    dtype, engine, extras = MATCHERS[name]
    rec = _newest_match(_history(), dtype, engine, extras)
    assert rec is not None, (
        f"no BENCH_HISTORY.jsonl line matches frontier entry {name!r} "
        f"({dtype}/{engine}/{extras}) — measure it with bench.py so the "
        "table is backed by a recorded line"
    )
    frontier_val, history_val = row[1], rec["value"]
    assert abs(frontier_val - history_val) <= TOL * history_val, (
        f"frontier {name!r} = {frontier_val} img/s but the newest matching "
        f"BENCH_HISTORY line measured {history_val} (> {TOL:.1%} apart) — "
        "re-measure and update iterative_inference_segm_tpu/frontier.py"
    )


def test_every_matcher_names_a_frontier_entry():
    names = {row[0] for row in FRONTIER}
    assert set(MATCHERS) <= names, (
        f"stale MATCHERS rules: {set(MATCHERS) - names}"
    )
