"""CLI error surfaces: library errors exit cleanly, mirroring the
reference's Result-returning main (anyhow "Error: ..." output) rather than
a Python traceback."""

import numpy as np
import pytest

from needle_tpu.cli import main
from needle_tpu.testing import make_synthetic_season


def test_search_without_dat_files_errors_cleanly(tmp_path, capsys):
    make_synthetic_season(tmp_path, num_episodes=2, episode_secs=20,
                          opening_secs=5, seed=9)
    with pytest.raises(SystemExit) as exc:
        main(["search", str(tmp_path)])
    assert exc.value.code != 0
    err = capsys.readouterr().err
    assert "frame hash data not found" in err
    assert "Traceback" not in err


def test_search_endings_without_ending_data_errors_cleanly(tmp_path, capsys):
    make_synthetic_season(tmp_path, num_episodes=2, episode_secs=30,
                          opening_secs=5, seed=10)
    assert main(["analyze", "--backend", "numpy", str(tmp_path)]) == 0
    with pytest.raises(SystemExit) as exc:
        main(["search", "--include-endings", "--engine", "numpy", str(tmp_path)])
    assert exc.value.code != 0
    err = capsys.readouterr().err
    assert "no ending hash data" in err
