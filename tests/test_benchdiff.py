"""tools/benchdiff.py mover classification (VERDICT r5 #1)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
from benchdiff import classify  # noqa: E402

PINS = {
    "ratio_threshold": 1.3,
    "jitter_floor_sec": 1.0,
    "pins": {
        "pinned_q": {
            "kind": "warmup_absorber",
            "steady_sec": 1.2,
            "noise_ceiling_sec": 2.0,
            "evidence": "test",
        }
    },
}


def _classes(old, new):
    return {m["query"]: m["class"] for m in classify(old, new, PINS)}


def test_non_movers_not_reported():
    assert _classes({"a": 1.0, "b": 2.0}, {"a": 1.25, "b": 1.5}) == {}


def test_subsecond_jitter():
    c = _classes({"a": 0.2}, {"a": 0.9})
    assert c == {"a": "subsecond-jitter"}


def test_pinned_noise_within_ceiling():
    c = _classes({"pinned_q": 1.2}, {"pinned_q": 1.9})
    assert c == {"pinned_q": "pinned-noise:warmup_absorber"}


def test_pinned_but_above_ceiling_is_unexplained():
    c = _classes({"pinned_q": 1.2}, {"pinned_q": 2.4})
    assert c == {"pinned_q": "UNEXPLAINED"}


def test_unpinned_above_floor_is_unexplained():
    c = _classes({"x": 1.5}, {"x": 2.5})
    assert c == {"x": "UNEXPLAINED"}


def test_queries_only_in_one_capture_ignored():
    assert _classes({"old_only": 1.0}, {"new_only": 9.0}) == {}


def test_repo_pins_file_parses_and_adjudicates_r5():
    """The committed BENCH_PINS.json must classify the six known r4->r5
    movers (VERDICT r5 'What's wrong' #2) as noise, end-to-end."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_PINS.json")) as f:
        pins = json.load(f)
    old = {
        "funnel_signup_click_purchase": 0.178,
        "zorder_cluster_stats": 0.221,
        "flagship_classify": 1.359,
        "tfidf_top_terms": 0.802,
        "ann_lsh_buckets": 0.572,
        "semdedup_embeddings": 1.330,
    }
    new = {
        "funnel_signup_click_purchase": 0.272,
        "zorder_cluster_stats": 0.325,
        "flagship_classify": 1.923,
        "tfidf_top_terms": 1.105,
        "ann_lsh_buckets": 0.772,
        "semdedup_embeddings": 1.742,
    }
    movers = classify(old, new, pins)
    assert len(movers) == 6
    assert all(m["class"] != "UNEXPLAINED" for m in movers)
