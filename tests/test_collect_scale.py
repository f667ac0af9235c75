"""Unit tests for tools/collect_scale.py — the scale-bench artifact
collector (VERDICT r4 next #3): best headline per config, partial/error
runs excluded, provenance recorded."""

import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "collect_scale", REPO / "tools" / "collect_scale.py"
)
collect_scale = importlib.util.module_from_spec(spec)
spec.loader.exec_module(collect_scale)


def _write(p: Path, lines):
    p.write_text("\n".join(lines) + "\n")


def test_headline_of_takes_final_json_line(tmp_path):
    log = tmp_path / "x.log"
    _write(log, [
        "warm: 3.1s",
        json.dumps({"detail_for": "m", "stages": [1, 2]}),
        json.dumps({"metric": "m", "value": 42.0, "unit": "s"}),
    ])
    assert collect_scale.headline_of(log)["value"] == 42.0


def test_headline_of_rejects_partial_and_error(tmp_path):
    for bad in (
        {"metric": "m", "value": 9.0, "partial": True},
        {"metric": "m", "value": 9.0, "error": "transport died"},
    ):
        log = tmp_path / "x.log"
        _write(log, [json.dumps(bad)])
        assert collect_scale.headline_of(log) is None
    # no JSON at all / value missing
    _write(tmp_path / "y.log", ["noise", '{"metric": "m"}'])
    assert collect_scale.headline_of(tmp_path / "y.log") is None


def test_collect_picks_min_per_config(tmp_path, monkeypatch):
    monkeypatch.setattr(collect_scale, "REPO", tmp_path)
    runs = tmp_path / ".bench_runs"
    runs.mkdir()
    for tag, cfg, v in (
        ("100000", "search1000", 90.0),
        ("110000", "search1000", 70.5),
        ("120000", "mixed1000", 12.0),
        ("130000", "full", 15.0),  # not in configs -> ignored
    ):
        _write(
            runs / f"{tag}_{cfg}.log",
            [json.dumps({"metric": cfg, "value": v, "unit": "s"})],
        )
    got = collect_scale.collect(runs, ["search1000", "mixed1000"])
    assert got["search1000"]["best"]["headline"]["value"] == 70.5
    assert got["search1000"]["best"]["log"].endswith("110000_search1000.log")
    assert len(got["search1000"]["runs"]) == 2
    assert got["mixed1000"]["best"]["headline"]["value"] == 12.0
    assert "full" not in got

def test_detail_embedded_in_best(tmp_path, monkeypatch):
    monkeypatch.setattr(collect_scale, "REPO", tmp_path)
    runs = tmp_path / ".bench_runs"
    runs.mkdir()
    _write(
        runs / "100000_search1000.log",
        [
            json.dumps({"detail_for": "m", "stages": {"walk": 20.0}}),
            json.dumps({"metric": "m", "value": 33.0, "unit": "s"}),
        ],
    )
    got = collect_scale.collect(runs, ["search1000"])
    assert got["search1000"]["best"]["detail"]["stages"]["walk"] == 20.0


def test_merge_prior_keeps_committed_best_on_empty_rescan(tmp_path):
    out = tmp_path / "BENCH_scale.json"
    prior_best = {
        "headline": {"metric": "m", "value": 26.5, "unit": "s"},
        "log": ".bench_runs/gone.log",
    }
    out.write_text(json.dumps({
        "configs": {"search1000": {"best": prior_best,
                                   "runs": [{"value": 26.5, "log": ".bench_runs/gone.log"}]}}
    }))
    by_cfg = {}  # fresh scan found nothing (logs wiped)
    collect_scale.merge_prior(by_cfg, out)
    assert by_cfg["search1000"]["best"]["headline"]["value"] == 26.5
    assert len(by_cfg["search1000"]["runs"]) == 1


def test_merge_prior_new_best_wins_but_provenance_united(tmp_path):
    out = tmp_path / "BENCH_scale.json"
    out.write_text(json.dumps({
        "configs": {"search1000": {
            "best": {"headline": {"metric": "m", "value": 30.0}},
            "runs": [{"value": 30.0, "log": ".bench_runs/old.log"}],
        }}
    }))
    by_cfg = {"search1000": {
        "best": {"headline": {"metric": "m", "value": 22.0},
                 "log": ".bench_runs/new.log"},
        "runs": [{"value": 22.0, "log": ".bench_runs/new.log"}],
    }}
    collect_scale.merge_prior(by_cfg, out)
    assert by_cfg["search1000"]["best"]["headline"]["value"] == 22.0
    logs = {r["log"] for r in by_cfg["search1000"]["runs"]}
    assert logs == {".bench_runs/new.log", ".bench_runs/old.log"}
