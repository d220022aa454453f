"""The real-corpus training recipe, proven at the CLI boundary.

The reference trains its nets on LJSpeech WAVs
(full_audio_generating_pipeline/model_training.py:141-148). azoom's
equivalent is one command:

    python -m azoom.cli.train --model fpu --corpus /path/to/wavs

These tests run that exact entry point against the reference repo's
committed recordings (or locally generated WAVs when not mounted) and
assert the things a user needs to trust the recipe: it trains, the loss
goes down, interruption resumes from the checkpoint, and a bundled
artifact can be warm-started for fine-tuning (--init-from).
"""

import re
from pathlib import Path

import numpy as np
import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

from azoom.io.wav import write_wav

REF_INPUTS = Path("/root/reference/data/inputs")


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    if REF_INPUTS.exists():
        return REF_INPUTS
    d = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    for i in range(4):
        write_wav(d / f"{i}.wav", (rng.standard_normal(24_000) * 0.1).astype(np.float32), 16_000)
    return d


def _run_cli(argv, capsys):
    from azoom.cli.train import main

    main(argv)
    return capsys.readouterr().out


def test_cli_corpus_trains_and_resumes(tmp_path, corpus_dir, capsys):
    """`azoom.cli.train --corpus` end to end, twice: the second invocation
    must resume from the orbax checkpoint the first wrote (same
    fault-tolerance contract as fit(); here proven at the CLI surface the
    docs point users to)."""
    ckpt = tmp_path / "ckpt"
    base = [
        "--model", "fpu", "--base", "4", "--batch", "2",
        "--seconds", "0.51", "--lr", "1e-3",
        "--corpus", str(corpus_dir), "--ckpt", str(ckpt), "--seed", "3",
    ]
    out1 = _run_cli(base + ["--steps", "2"], capsys)
    assert "corpus:" in out1 and "finished at step 2" in out1
    assert any(ckpt.iterdir()), "no checkpoint written"

    out2 = _run_cli(base + ["--steps", "4"], capsys)
    assert "resumed from step 2" in out2
    assert "finished at step 4" in out2


def test_cli_warm_start_from_bundled(tmp_path, corpus_dir, capsys):
    """--init-from fine-tunes a bundled artifact on a real corpus (the
    reference's LJSpeech fine-tune path). Uses the smallest bundled net;
    the CLI must reject a feature mismatch loudly."""
    out = _run_cli(
        [
            "--model", "fpu", "--base", "32", "--batch", "1",
            "--seconds", "0.51", "--steps", "1",
            "--corpus", str(corpus_dir), "--init-from", "fpu",
            "--ckpt", str(tmp_path / "ft"), "--seed", "0",
        ],
        capsys,
    )
    assert "warm-starting from bundled 'fpu'" in out

    with pytest.raises(SystemExit, match="physics"):
        _run_cli(
            [
                "--model", "tpufpu", "--base", "64", "--batch", "1",
                "--seconds", "0.51", "--steps", "1",
                "--corpus", str(corpus_dir), "--init-from", "tpufpu",
                "--ckpt", str(tmp_path / "ft2"),
            ],
            capsys,
        )


def test_corpus_loss_decreases():
    """fit() on real WAVs: BCE after 40 steps must be clearly below the
    first-step loss (the loss-goes-down guarantee of the recipe)."""
    from azoom.config import PipelineConfig
    from azoom.models.unet import FreqPreservingUNet
    from azoom.train.loop import fit

    corpus = REF_INPUTS if REF_INPUTS.exists() else None
    if corpus is None:
        pytest.skip("reference corpus not mounted; CLI tests cover synthetic")
    cfg = PipelineConfig(mic_dist=0.04)
    res = fit(
        FreqPreservingUNet(base=4), cfg, n_steps=40, batch_size=2,
        learning_rate=3e-3, n_samples=8_192, corpus_root=corpus,
        seed=1, log_every=1,
    )
    first = res.losses[0][1]
    tail = np.mean([l for _, l in res.losses[-5:]])
    assert tail < first * 0.9, (first, tail)
