#!/usr/bin/env python3
"""Collect the round's best scale-bench headlines into a committed,
machine-readable artifact (VERDICT r4 next #3).

The driver only ever captures the default 28-episode config's final line
(BENCH_r{N}.json); the search1000/mixed1000 records previously lived in
prose (STATUS.md) and loose .bench_runs logs. This tool scans every
.bench_runs/*.log for a parseable compact headline (the final JSON line
bench.py's emit_result guarantees), groups runs by config (the log-file
name the era watcher stamps: <HHMMSS>_<config>.log), and writes the best
(min `value`) headline per config — plus provenance (source log, mtime,
all observed values) — as one JSON file to commit, e.g.
BENCH_scale_r05.json. Idempotent; safe to run any time.

Usage: python3 tools/collect_scale.py [--runs-dir .bench_runs]
           [--out BENCH_scale_r05.json] [--configs search1000,mixed1000]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _log_ref(log_path: Path) -> str:
    """Repo-relative when the log lives under the repo, absolute otherwise
    (--runs-dir may point at logs rescued off-repo, e.g. /tmp)."""
    try:
        return str(log_path.relative_to(REPO))
    except ValueError:
        return str(log_path)


def headline_of(log_path: Path) -> dict | None:
    """Last JSON line carrying a numeric `value` — bench.py guarantees
    the compact headline is the final line of a completed run; partial
    or aborted runs are excluded (they carry partial/error flags)."""
    try:
        lines = log_path.read_text(errors="replace").strip().splitlines()
    except OSError:
        return None
    for ln in reversed(lines):
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            d = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if isinstance(d.get("value"), (int, float)) and "metric" in d:
            if d.get("partial") or d.get("error"):
                return None
            return d
    return None


def detail_of(log_path: Path) -> dict | None:
    """Last `detail_for` JSON line (stage breakdowns, per-trial times,
    probes) — embedded in the artifact so the stage evidence survives
    even if the .bench_runs log is lost (the r5 host reimage wiped the
    gitignored logs the r4 artifact pointed at)."""
    try:
        lines = log_path.read_text(errors="replace").strip().splitlines()
    except OSError:
        return None
    for ln in reversed(lines):
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            d = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if "detail_for" in d:
            return d
    return None


def collect(runs_dir: Path, configs: list[str]) -> dict:
    by_cfg: dict[str, dict] = {}
    for log_path in sorted(runs_dir.glob("*.log")):
        stem = log_path.stem  # "<HHMMSS>_<config>"
        cfg = stem.split("_", 1)[1] if "_" in stem else stem
        if cfg not in configs:
            continue
        head = headline_of(log_path)
        if head is None:
            continue
        entry = by_cfg.setdefault(
            cfg, {"best": None, "runs": []}
        )
        entry["runs"].append(
            {
                "value": head["value"],
                "log": _log_ref(log_path),
                "log_mtime": time.strftime(
                    "%Y-%m-%d %H:%M:%S",
                    time.localtime(log_path.stat().st_mtime),
                ),
            }
        )
        if entry["best"] is None or head["value"] < entry["best"]["headline"]["value"]:
            entry["best"] = {
                "headline": head,
                "log": _log_ref(log_path),
            }
            detail = detail_of(log_path)
            if detail is not None:
                entry["best"]["detail"] = detail
    return by_cfg


def merge_prior(by_cfg: dict, out_path: Path) -> None:
    """Keep the existing artifact's best per config when it still beats
    (or is the only record of) this round's runs — a collector run with
    an empty/fresh .bench_runs must never regress the committed bests."""
    try:
        prior = json.loads(out_path.read_text()).get("configs", {})
    except (OSError, json.JSONDecodeError):
        return
    for cfg, pentry in prior.items():
        pbest = pentry.get("best")
        if not pbest or not isinstance(
            pbest.get("headline", {}).get("value"), (int, float)
        ):
            continue
        entry = by_cfg.setdefault(cfg, {"best": None, "runs": []})
        if (
            entry["best"] is None
            or pbest["headline"]["value"] < entry["best"]["headline"]["value"]
        ):
            entry["best"] = pbest
        # carry prior run provenance rows not re-observed this scan
        seen = {r.get("log") for r in entry["runs"]}
        for r in pentry.get("runs", []):
            if r.get("log") not in seen:
                entry["runs"].append(r)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--runs-dir", default=str(REPO / ".bench_runs"))
    ap.add_argument("--out", default=str(REPO / "BENCH_scale_r05.json"))
    ap.add_argument(
        "--configs", default="search1000,mixed1000,search300,small3"
    )
    args = ap.parse_args()
    configs = [c for c in args.configs.split(",") if c]
    by_cfg = collect(Path(args.runs_dir), configs)
    merge_prior(by_cfg, Path(args.out))
    out = {
        "generated": time.strftime("%Y-%m-%d %H:%M:%S"),
        "note": (
            "best recorded compact headline per scale config this round; "
            "values are transport-era-bound (see CLAUDE.md) — judge on "
            "the stage breakdowns in the source logs"
        ),
        "configs": by_cfg,
    }
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    summary = {
        c: (e["best"]["headline"]["value"] if e["best"] else None)
        for c, e in by_cfg.items()
    }
    print(json.dumps({"wrote": args.out, "best_values": summary}))


if __name__ == "__main__":
    main()
