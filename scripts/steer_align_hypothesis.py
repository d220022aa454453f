"""Hypothesis test: steer-aligned features for off-broadside targets.

The bundled mask nets were trained with the target pinned at broadside
(TRAIN_ANGLES target=90, train/data.py:30). The learned pipeline steers
only the MVDR; the net still sees raw IPD, so "zoom to theta" degenerates
to "zoom to whoever is nearest broadside". Adversarial case: target at 60,
an interferer AT broadside (90).

Candidate fix, zero retraining: rotate the STFT by the conjugate steering
vector before feature extraction, so the look direction appears broadside
to the net (exact no-op at theta=90).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from azoom.beam.mvdr import masked_mvdr
from azoom.config import PipelineConfig
from azoom.dsp.delays import far_field_delays, steering_vector
from azoom.dsp.stft import istft, rfft_freqs, stft
from azoom.eval.projection import sir_improvement_db
from azoom.models.pretrained import load_bundled
from azoom.pipelines.learned import learned_enhance, predict_mask
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like

CFG = PipelineConfig(mic_dist=0.04)
N = 32_000
FS = CFG.fs


def enhance_aligned(mix, model, variables, feature_kind, steer_deg):
    """Mask from steer-aligned STFT; MVDR on the original STFT at steer."""
    Y = stft(mix, CFG.n_fft, CFG.hop)
    freqs = rfft_freqs(CFG.n_fft, CFG.fs)
    d = steering_vector(freqs, steer_deg, CFG.mic_dist, CFG.c, CFG.n_mics)
    # Rotate each channel by conj(d_m): the target's inter-channel phase
    # becomes zero -> appears broadside to the net.
    Y_al = Y * jnp.conj(d).swapaxes(-1, -2)[:, :, None]  # d is (F, M)
    tgt_mask = predict_mask(model, variables, Y_al, feature_kind)
    S = masked_mvdr(
        Y, 1.0 - tgt_mask, d, freqs, target_mask=tgt_mask, mask_floor=0.05,
        sigma=CFG.sigma, hp_cutoff_hz=CFG.hp_cutoff_hz,
    )
    return istft(S, CFG.n_fft, CFG.hop, length=mix.shape[-1])


def main():
    for name in ["fpu", "tpufpu_nano"]:
        model, variables, fk = load_bundled(name)
        print(f"=== {name} (features={fk}) ===")
        for tgt_deg, int_degs in [
            (60.0, (90.0, 130.0)),   # adversarial: interferer at broadside
            (60.0, (110.0, 150.0)),  # off-broadside target, empty broadside
            (90.0, (40.0, 130.0)),   # training geometry (sanity: align is no-op)
            (120.0, (90.0, 40.0)),   # mirrored adversarial
        ]:
            keys = jax.random.split(jax.random.PRNGKey(7), 3)
            tgt = speech_like(keys[0], N, FS)
            ints = jnp.stack([speech_like(k, N, FS) for k in keys[1:]])
            sc = make_scene(tgt, ints, tgt_deg, jnp.asarray(int_degs),
                            CFG.mic_dist, FS)
            mix = sc["mixture"]

            base = learned_enhance(mix, model, variables, CFG,
                                   feature_kind=fk, steer_deg=tgt_deg,
                                   steer_align=False)
            alig = enhance_aligned(mix, model, variables, fk, tgt_deg)
            s_base = float(sir_improvement_db(
                base, mix[0], sc["target_ref"], sc["interference_ref"]))
            s_alig = float(sir_improvement_db(
                alig, mix[0], sc["target_ref"], sc["interference_ref"]))
            print(f"  tgt={tgt_deg:5.1f} ints={int_degs}: "
                  f"baseline {s_base:+7.2f} dB | aligned {s_alig:+7.2f} dB")


if __name__ == "__main__":
    main()
