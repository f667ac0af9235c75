"""Pin the CLI flag surface against the reference's clap definition.

Static table derived from needle/src/main.rs:13-193: every subcommand's
flags, short aliases, and defaults. The reference has exactly ONE short
alias (-m for analyze --mode, main.rs:31) and two clap global=true flags
(--no-threading / --file-headers-only, main.rs:178-193) accepted before
OR after the subcommand. Our extensions (--backend / --engine) are
explicitly listed so new divergence fails loudly.
"""

import argparse

from needle_tpu import constants
from needle_tpu.cli import _build_parser

# flag -> (short_alias_or_None, default) per subcommand — main.rs:13-193
REFERENCE_SURFACE = {
    "analyze": {
        "--mode": ("-m", "audio"),
        "--opening-search-percentage": (
            None,
            constants.DEFAULT_OPENING_SEARCH_PERCENTAGE,
        ),
        "--ending-search-percentage": (
            None,
            constants.DEFAULT_ENDING_SEARCH_PERCENTAGE,
        ),
        "--hash-duration": (None, constants.DEFAULT_HASH_DURATION),
        "--include-endings": (None, False),
        "--threaded-decoding": (None, False),
        "--force": (None, False),
    },
    "search": {
        "--hash-match-threshold": (
            None,
            constants.DEFAULT_HASH_MATCH_THRESHOLD,
        ),
        "--min-opening-duration": (
            None,
            constants.DEFAULT_MIN_OPENING_DURATION,
        ),
        "--min-ending-duration": (
            None,
            constants.DEFAULT_MIN_ENDING_DURATION,
        ),
        "--time-padding": (
            None,
            constants.DEFAULT_OPENING_AND_ENDING_TIME_PADDING,
        ),
        "--analyze": (None, False),
        "--use-skip-files": (None, False),
        "--write-skip-files": (None, False),
        "--include-endings": (None, False),
        "--no-display": (None, False),
    },
    "info": {},
}

# needle-tpu additions beyond the reference surface (documented extensions)
EXTENSIONS = {
    "analyze": {"--backend"},
    "search": {"--engine"},
    "info": set(),
}

GLOBAL_FLAGS = {"--no-threading", "--file-headers-only"}


def _subparsers():
    p = _build_parser()
    for a in p._actions:
        if isinstance(a, argparse._SubParsersAction):
            return p, a.choices
    raise AssertionError("no subparsers found")


def test_flag_surface_matches_reference_table():
    _, subs = _subparsers()
    assert set(subs) == set(REFERENCE_SURFACE)
    for cmd, table in REFERENCE_SURFACE.items():
        sp = subs[cmd]
        longs = {}
        shorts = {}
        for a in sp._actions:
            ls = [s for s in a.option_strings if s.startswith("--")]
            ss = [s for s in a.option_strings if not s.startswith("--")]
            for s in ls:
                longs[s] = a
            if ls and ss:
                shorts[ls[0]] = ss[0]
        own = set(longs) - GLOBAL_FLAGS - {"--help"}
        assert own == set(table) | EXTENSIONS[cmd], cmd
        for flag, (short, default) in table.items():
            assert shorts.get(flag) == short, (cmd, flag)
            if default is not None:
                assert longs[flag].default == default, (cmd, flag)


def test_mode_short_alias_parses():
    p = _build_parser()
    args = p.parse_args(["analyze", "-m", "audio", "x.mkv"])
    assert args.mode == "audio"


def test_global_flags_accepted_after_subcommand():
    """clap global=true semantics (main.rs:178-193): both positions work
    and a root-level occurrence isn't clobbered by the subparser."""
    p = _build_parser()
    for argv in (
        ["--no-threading", "search", "a", "b"],
        ["search", "--no-threading", "a", "b"],
    ):
        args = p.parse_args(argv)
        assert args.no_threading is True
        assert args.file_headers_only is False
    args = p.parse_args(["--file-headers-only", "info"])
    assert args.file_headers_only is True
    args = p.parse_args(["analyze", "--file-headers-only", "x.mkv"])
    assert args.file_headers_only is True
