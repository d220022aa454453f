"""WPD convolutional beamformer (joint dereverb + beamform, azoom.beam.wpd).

The reference handles reverberation as a WPE -> masked-MVDR cascade
(dereverb.py -> oracle_reverb.py); WPD folds both into one weighted
solve. These tests pin (a) the delayed-frame stacking, (b) oracle-mask
behavior on reverberant scenes vs the MVDR baseline, (c) blind
learned-mask behavior, and (d) degenerate-input safety. Thresholds sit
~2 dB under the measured values (RESULTS.md "WPD").
"""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.beam.mvdr import masked_mvdr
from azoom.beam.wpd import masked_wpd, stack_delayed_frames, wpd_beamform
from azoom.config import PipelineConfig
from azoom.dsp.delays import steering_vector
from azoom.dsp.stft import istft, rfft_freqs, stft
from azoom.eval.projection import osinr_osir
from azoom.masks.oracle import ibm_noise_mask
from azoom.sim.scene import SceneSpec, generate_scene

CFG = PipelineConfig(mic_dist=0.08, sigma=1e-6)


def _oracle_setup(seed, n_interferers=2, max_order=6):
    spec = SceneSpec(
        reverb=True, n_interferers=n_interferers, duration_s=2.0, snr_db=50.0
    )
    sc = generate_scene(jax.random.PRNGKey(seed), spec, max_order=max_order)
    Y = stft(sc["mixture"], CFG.n_fft, CFG.hop)
    S_tgt = stft(sc["target_ref"], CFG.n_fft, CFG.hop)
    S_int = stft(sc["interference_ref"], CFG.n_fft, CFG.hop)
    noise_mask = ibm_noise_mask(S_tgt, S_int)
    freqs = rfft_freqs(CFG.n_fft, CFG.fs)
    d = steering_vector(
        freqs, CFG.angle_target_deg, CFG.mic_dist, CFG.c, CFG.n_mics
    )
    return sc, Y, 1.0 - noise_mask, d, freqs


def _sir_improvement(out, sc):
    _, sir = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(
        sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
    )
    return float(sir) - float(sir_in)


def test_stack_delayed_frames_layout():
    Y = jnp.arange(2 * 3 * 5, dtype=jnp.complex64).reshape(2, 3, 5)
    Yb = stack_delayed_frames(Y, taps=2, delay=2)
    assert Yb.shape == (6, 3, 5)
    # Block 0 is the current frame.
    np.testing.assert_array_equal(np.asarray(Yb[:2]), np.asarray(Y))
    # Block k is Y delayed by delay+k-1 frames, zero-padded at the front.
    np.testing.assert_array_equal(
        np.asarray(Yb[2:4, :, 2:]), np.asarray(Y[:, :, :-2])
    )
    np.testing.assert_array_equal(np.asarray(Yb[2:4, :, :2]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(Yb[4:6, :, 3:]), np.asarray(Y[:, :, :-3])
    )


def test_wpd_oracle_reverb_at_least_mvdr():
    """Oracle-mask WPD on reverberant scenes: measured +0.2..+2.1 dB over
    the masked-MVDR baseline (seeds 4/7: MVDR 19.8/20.8, WPD 20.1/22.6)."""
    gains = []
    for seed in (4, 7):
        sc, Y, tgt_mask, d, freqs = _oracle_setup(seed)
        out_wpd = istft(
            masked_wpd(Y, tgt_mask, d, freqs, iterations=2),
            CFG.n_fft, CFG.hop, length=sc["mixture"].shape[-1],
        )
        out_mvdr = istft(
            masked_mvdr(
                Y, 1.0 - tgt_mask, d, freqs, target_mask=tgt_mask,
                sigma=CFG.sigma, mask_floor=0.05,
            ),
            CFG.n_fft, CFG.hop, length=sc["mixture"].shape[-1],
        )
        imp_wpd = _sir_improvement(out_wpd, sc)
        imp_mvdr = _sir_improvement(out_mvdr, sc)
        assert imp_wpd > 15.0, f"seed {seed}: WPD only {imp_wpd:.2f} dB"
        gains.append(imp_wpd - imp_mvdr)
    # On average the joint solve should not lose to the cascade-free MVDR.
    assert float(np.mean(gains)) > -1.0, gains


def test_wpd_blind_learned_mask_reverb():
    """Blind (fpu_reverb mask net) WPD on moderate synthetic reverb:
    measured +18.4 dB mean over 6 scenes (MVDR +18.2, WPE->MVDR +17.1)."""
    from azoom.models.pretrained import load_bundled
    from azoom.pipelines.learned import learned_enhance

    cfg = PipelineConfig(mic_dist=0.04, sigma=1e-7)
    model, variables, fk = load_bundled("fpu_reverb")
    spec = SceneSpec(reverb=True, n_interferers=2, duration_s=2.0, snr_db=50.0)
    imps = []
    for seed in (100, 102):
        sc = generate_scene(jax.random.PRNGKey(seed), spec, max_order=6)
        out = learned_enhance(
            sc["mixture"], model, variables, cfg, "wpd", fk
        )
        imps.append(_sir_improvement(out, sc))
    assert float(np.mean(imps)) > 14.0, imps


def test_wpd_finite_on_silence():
    Y = jnp.zeros((2, 257, 60), dtype=jnp.complex64)
    mask = jnp.zeros((257, 60))
    freqs = rfft_freqs(512, 16000)
    d = steering_vector(freqs, 90.0, 0.08, 343.0, 2)
    S = wpd_beamform(Y, mask, d, freqs)
    assert np.isfinite(np.asarray(S)).all()


def test_wpd_batched_matches_single():
    sc0, Y0, m0, d, freqs = _oracle_setup(11, max_order=4)
    sc1, Y1, m1, _, _ = _oracle_setup(12, max_order=4)
    Yb = jnp.stack([Y0, Y1])
    mb = jnp.stack([m0, m1])
    Sb = wpd_beamform(Yb, mb, d, freqs)
    S0 = wpd_beamform(Y0, m0, d, freqs)
    np.testing.assert_allclose(
        np.asarray(Sb[0]), np.asarray(S0), rtol=2e-2, atol=2e-4
    )


def test_wpd_taps0_is_weighted_mpdr():
    """taps=0 must degrade gracefully (no delayed frames, still a valid
    distortionless beamformer)."""
    sc, Y, tgt_mask, d, freqs = _oracle_setup(5, max_order=4)
    out = istft(
        masked_wpd(Y, tgt_mask, d, freqs, taps=0),
        CFG.n_fft, CFG.hop, length=sc["mixture"].shape[-1],
    )
    assert np.isfinite(np.asarray(out)).all()
    assert _sir_improvement(out, sc) > 8.0
