"""Fine-tune the nano flagship on REAL recorded speech (+10k steps).

Round-4 VERDICT item 1: every bundled artifact is trained on synthetic
``sim/signals.speech_like`` scenes; real speech appears only at eval
time. The reference trains on LJSpeech recordings
(model_training.py:141-148, corpus plumbing world.py:38-67). This run
closes the loop the round-3 native corpus engine opened: train through
``fit(native_loader=True)`` on a corpus of real recorded speech
assembled from the reference's committed stems, with all scene mixing
(room/geometry/SIR randomization) still on device via mix_batch.

Corpus hygiene — utterance-level train/eval split: ONLY the
"2-source-scene" family of recordings is ingested (target_reference_2 /
interference_reference_2 and the output_2src_sigma_* enhanced stems,
which carry the same two utterances). The anechoic ``test_*`` trio —
the primary blind real-speech eval fixture — shares NO utterance with
the training corpus, so the held-out real number stays honest. The
reverberant ``mixture_2_sources`` fixture IS in-domain for this model
(its stems are the corpus) and is reported only with that caveat.

Recipe: exactly scripts/train_nano_ctl.py (the continued-training
control: warm-start bundled nano, 0.5*IBM + 0.5*slim-teacher soft
targets, lr 1e-4, 10k steps, angle jitter 3 deg) with only the source
material changed from synthesized to real speech. The control measured
+22.6 dB on the real fixture (drift cost ~2.1 dB vs bundled nano's
+24.68); if real-source training drifts LESS (or gains), real speech
buys robustness; if it matches the control, source realism is not the
binding axis at this corpus size.

Also measures (VERDICT "done" criterion) the native loader's sustained
throughput on this corpus, standalone and during the run.
"""
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.pretrained import load_bundled
from azoom.models.unet import TPUFPU, pad_frames
from azoom.train.loop import fit

import jax

REF = Path("/root/reference/data")
CORPUS = Path("/root/repo/data/real_corpus")  # gitignored

# The 2src-family stems: the two LJSpeech utterances of the reverberant
# 2-source scene, as committed refs plus the sigma-study enhanced
# outputs of the same scene (more acoustic "views" of the same speech).
TRAIN_FILES = [
    REF / "inputs" / "target_reference_2.wav",
    REF / "inputs" / "interference_reference_2.wav",
    REF / "outputs" / "output_2src_sigma_0.0e+00.wav",
    REF / "outputs" / "output_2src_sigma_0.0e+00_tst60.wav",
    REF / "outputs" / "output_2src_sigma_1.0e-05.wav",
    REF / "outputs" / "output_2src_sigma_1.0e-06.wav",
    REF / "outputs" / "output_2src_sigma_1.0e-08.wav",
    REF / "outputs" / "output_2src_sigma_1.0e-09.wav",
]


def assemble_corpus() -> Path:
    CORPUS.mkdir(parents=True, exist_ok=True)
    for f in TRAIN_FILES:
        dst = CORPUS / f.name
        if not dst.exists():
            shutil.copyfile(f, dst)
    return CORPUS


def loader_throughput(root: Path, n_batches: int = 30) -> float:
    """Sustained native-loader throughput: batches/s of (24, 32000)
    crops with the consumer draining as fast as the producer fills."""
    from azoom.sim.corpus_native import NativeCorpus

    with NativeCorpus(root, 16_000, n_signals=24, n_samples=32_000,
                      seed=0, depth=4) as c:
        c.next_batch()  # cold start: first decode fills the cache
        t0 = time.perf_counter()
        for _ in range(n_batches):
            c.next_batch()
        dt = time.perf_counter() - t0
    return n_batches / dt


if __name__ == "__main__":
    # --aug (round 5, VERDICT r4 #7): re-power the question with the
    # augmented corpus (speed perturbation + randomized-room renders of
    # the same hygienic utterance family, ~11x the material —
    # scripts/build_real_corpus_aug.py). Same recipe otherwise.
    aug = "--aug" in sys.argv
    if aug:
        root = Path("/root/repo/data/real_corpus_aug")
        if not root.exists():
            sys.exit("run scripts/build_real_corpus_aug.py first")
        ckpt = "/root/repo/checkpoints/tpufpu_nano_real_aug"
    else:
        root = assemble_corpus()
        ckpt = "/root/repo/checkpoints/tpufpu_nano_real"
    bps = loader_throughput(root)
    print(f"[CORPUS] native loader sustained: {bps:.1f} batches/s "
          f"({bps * 24 * 2:.0f} source-seconds/s)", flush=True)

    _, init_vars, _ = load_bundled("tpufpu_nano", quant=False)
    tmodel, tvars, _ = load_bundled("tpufpu_slim", quant=False)

    @jax.jit
    def teacher_fn(features):
        f, t = pad_frames(features, 16)
        return jax.lax.stop_gradient(tmodel.apply(tvars, f)[..., :t])

    cfg = PipelineConfig(mic_dist=0.04)
    t0 = time.perf_counter()
    res = fit(
        TPUFPU(base=64, fold=4, bneck=4, dec_div=2, enc_div=2),
        cfg,
        n_steps=10_000,
        batch_size=8,
        feature_kind="physics",
        angle_jitter_deg=3.0,
        corpus_root=root,
        native_loader=True,
        init_variables=init_vars,
        teacher_fn=teacher_fn,
        distill_alpha=0.5,
        checkpoint_dir=ckpt,
        resume=True,
        log_every=500,
    )
    dt = time.perf_counter() - t0
    print(f"[TRAIN] done at step {int(res.state.step)}; "
          f"{res.steps_run} steps in {dt:.0f}s "
          f"({res.steps_run / max(dt, 1e-9):.2f} steps/s sustained, "
          f"native loader feeding 24x2s real crops/step)", flush=True)
