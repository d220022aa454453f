"""Training loop: BCE mask estimation with checkpoint/resume.

Rebuilds the reference's two trainers (torch Adam 1e-4 + BCELoss,
model_training.py:29-31,152-181; Keras adam + binary_crossentropy,
model_neural.py:175-178) as a jitted optax loop, and fixes the reference's
no-resume gap (SURVEY.md §5: weights-only torch.save at the end, no
optimizer state, no mid-training checkpoints) with orbax: full train state
(params, batch stats, optimizer moments, step) is checkpointed every
``checkpoint_every`` steps and restored by ``fit(..., resume=True)``.

Data-parallel scaling: pass a ``jax.sharding.Mesh`` and the train step is
jitted with the batch sharded over the 'data' axis — gradients are averaged
by XLA collectives over ICI (no NCCL/MPI analog needed; SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from azoom.config import PipelineConfig
from azoom.train.data import synth_batch

__all__ = ["TrainState", "create_state", "bce_loss", "make_train_step", "fit"]


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def bce_loss(pred: jnp.ndarray, label: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Binary cross-entropy on sigmoid outputs (torch nn.BCELoss semantics,
    model_training.py:153)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(label * jnp.log(p) + (1.0 - label) * jnp.log(1.0 - p))


def create_state(
    model,
    key: jax.Array,
    sample_shape: tuple[int, ...],
    learning_rate: float = 1e-4,
) -> TrainState:
    """Initialize params/batch-stats/Adam state (Adam 1e-4,
    model_training.py:152)."""
    vars_ = model.init(key, jnp.zeros(sample_shape, jnp.float32))
    return TrainState.create(
        apply_fn=model.apply,
        params=vars_["params"],
        batch_stats=vars_.get("batch_stats", {}),
        tx=optax.adam(learning_rate),
    )


def physics_residual(
    features: jnp.ndarray, pred: jnp.ndarray, feature_kind: str = "logmag_ipd"
) -> jnp.ndarray:
    """Physics-informed mask residual — the loss term that makes any conv
    mask net the reference roadmap's "PINN-CNN" (TODO:6; no reference
    implementation exists).

    Training scenes steer the target to broadside (train.data.TRAIN_ANGLES
    puts it at 90 deg, and the steer-aligned serving path rotates every
    look direction to broadside before feature extraction), where the
    plane-wave array model says the target's inter-channel phase
    difference is exactly zero. A mask bin that claims "target" on a bin
    whose measured IPD contradicts that manifold violates the physics the
    array is built on; the residual prices the violation as
    mean(mask * (1 - cos(IPD))) in [0, 2] — smooth, wrap-safe, and zero
    exactly on the steering manifold. It reads the IPD straight from the
    feature tensor (channel 1 of 'logmag_ipd', the sin/cos pair of
    'physics'), so it adds no DSP to the step.

    Low frequencies contribute ~0 for ANY bearing (IPD -> 0 as f -> 0):
    that is the correct physics — a 2-mic array has no spatial information
    there — so the prior concentrates exactly where spatial evidence
    exists.
    """
    if feature_kind == "physics":
        one_minus_cos = 1.0 - features[..., 2]
    else:
        one_minus_cos = 1.0 - jnp.cos(features[..., 1])
    return jnp.mean(pred * one_minus_cos)


def make_train_step(
    mesh: jax.sharding.Mesh | None = None, remat: bool = False,
    physics_fn: Callable | None = None,
) -> Callable:
    """Build the jitted train step; with a mesh, batch dims are sharded over
    the 'data' axis and XLA inserts the gradient all-reduce. ``remat``
    rematerializes the forward pass in the backward (jax.checkpoint),
    trading FLOPs for HBM so larger batches fit per chip. ``physics_fn``
    (features, pred) -> scalar adds a physics-informed penalty to the BCE
    objective (see physics_residual — the PINN-CNN axis)."""

    def step(state: TrainState, features: jnp.ndarray, label: jnp.ndarray):
        def forward(params, features):
            return state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                features,
                train=True,
                mutable=["batch_stats"],
            )

        if remat:
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            pred, mutated = forward(params, features)
            loss = bce_loss(pred, label)
            if physics_fn is not None:
                loss = loss + physics_fn(features, pred)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, loss

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(replicated, data_sharding, data_sharding),
        out_shardings=(replicated, replicated),
    )


@dataclasses.dataclass
class FitResult:
    state: TrainState
    losses: list
    steps_run: int


def fit(
    model,
    cfg: PipelineConfig,
    n_steps: int = 1000,
    batch_size: int = 8,
    learning_rate: float = 1e-4,
    feature_kind: str = "logmag_ipd",
    n_samples: int = 32_000,
    reverb: bool = False,
    angle_jitter_deg: float = 0.0,
    interferer_kind: str = "speech",
    corpus_root: str | Path | None = None,
    init_variables: Any | None = None,
    seed: int = 0,
    checkpoint_dir: str | Path | None = None,
    checkpoint_every: int = 200,
    resume: bool = True,
    mesh: jax.sharding.Mesh | None = None,
    remat: bool = False,
    log_every: int = 50,
    log_fn: Callable[[str], None] = print,
    teacher_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    distill_alpha: float = 0.5,
    pinn_weight: float = 0.0,
    native_loader: bool = False,
) -> FitResult:
    """Train a mask estimator on on-the-fly synthesized scenes.

    ``corpus_root`` (or env AZOOM_DATA_DIR via sim.datasets.get_sources)
    switches source material from synthesized utterances to random crops
    of real recordings — the reference's LJSpeech training path
    (model_training.py:141-148); scene mixing/features/labels still run
    on device via train.data.mix_batch.

    ``interferer_kind`` selects the interferer source class for
    synthesized batches ('mixed' = uniform random class per interferer —
    the non-speech robustness fine-tune axis; train.data.synth_batch).

    ``teacher_fn`` enables knowledge distillation: a jitted
    features -> mask-probabilities function (e.g. a larger bundled net);
    the BCE target becomes the blend
    (1 - distill_alpha) * oracle_IBM + distill_alpha * teacher(features),
    i.e. standard soft-target cross-entropy distillation on top of the
    hard labels. The oracle IBM stays in the mix so the student can
    out-learn teacher errors.

    ``pinn_weight`` > 0 adds the physics-informed IPD-consistency
    residual (see physics_residual — the reference roadmap's "PINN-CNN"
    axis) to the BCE objective with that weight.

    Fault-tolerant: with ``checkpoint_dir`` set, training resumes from the
    latest saved step after interruption (params + Adam moments + batch
    stats + PRNG position all restored).
    """
    n_channels = {"logmag_ipd": 2, "physics": 4}[feature_kind]
    # Shape probe: one batch to determine (F, T).
    probe = synth_batch(
        jax.random.PRNGKey(0), 1, cfg, feature_kind, n_samples
    )
    F, T = probe["features"].shape[1:3]
    state = create_state(
        model, jax.random.PRNGKey(seed), (1, F, T, n_channels), learning_rate
    )
    if init_variables is not None:
        # Warm start (fine-tune) from existing weights, e.g. a bundled
        # artifact — the reference's LJSpeech fine-tune entry point
        # (model_training.py:141-148 loads a prior state_dict the same
        # way). A checkpoint resume below still takes precedence.
        state = state.replace(
            params=init_variables["params"],
            batch_stats=init_variables.get("batch_stats", state.batch_stats),
        )

    start_step = 0
    mngr = None
    if checkpoint_dir is not None:
        import orbax.checkpoint as ocp

        checkpoint_dir = Path(checkpoint_dir).absolute()
        checkpoint_dir.mkdir(parents=True, exist_ok=True)
        mngr = ocp.CheckpointManager(
            checkpoint_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=3),
        )
        if resume and mngr.latest_step() is not None:
            start_step = int(mngr.latest_step())
            restored = mngr.restore(
                start_step, args=ocp.args.StandardRestore(_abstract(state))
            )
            state = jax.tree_util.tree_map(jnp.asarray, restored)
            log_fn(f"[TRAIN] resumed from step {start_step}")

    corpus = native_corpus = None
    if corpus_root is not None:
        if native_loader:
            # C++ prefetch engine (cpp/corpus_engine.cpp): WAV IO/decode
            # runs in a background thread ahead of the train step — the
            # native DataLoader(num_workers=2) analogue. Opt-in because
            # its crop stream is sequential from open, so a mid-run
            # resume re-draws from the stream start (the Python path
            # keys every step's crops independently).
            from azoom.sim.corpus_native import NativeCorpus, native_available

            if native_available():
                native_corpus = NativeCorpus(
                    corpus_root, cfg.fs, n_signals=3 * batch_size,
                    n_samples=n_samples, seed=seed,
                )
                log_fn(f"[TRAIN] native corpus loader: "
                       f"{len(native_corpus)} files under {corpus_root}")
            else:
                log_fn("[TRAIN] native loader unavailable; "
                       "falling back to LocalCorpus")
        if native_corpus is None:
            from azoom.sim.datasets import LocalCorpus

            corpus = LocalCorpus(corpus_root, cfg.fs)
            if not len(corpus):
                raise FileNotFoundError(f"no wavs under {corpus_root}")
            log_fn(f"[TRAIN] corpus: {len(corpus)} files under {corpus_root}")

    physics_fn = None
    if pinn_weight > 0.0:
        # PINN-CNN: weight the physics-consistency residual into the
        # objective (reference roadmap TODO:6).
        physics_fn = lambda f, p: pinn_weight * physics_residual(  # noqa: E731
            f, p, feature_kind
        )
    train_step = make_train_step(mesh, remat=remat, physics_fn=physics_fn)
    losses = []
    key = jax.random.PRNGKey(seed + 1)
    try:
        state, losses = _fit_loop(
            state, train_step, key, start_step, n_steps, batch_size, cfg,
            feature_kind, n_samples, angle_jitter_deg, reverb,
            interferer_kind, seed, corpus, native_corpus, teacher_fn,
            distill_alpha, mngr, checkpoint_every, log_every, log_fn,
        )
    finally:
        # Always stop the C++ prefetch thread — an exception or Ctrl-C
        # mid-training must not leave the worker and ring buffers alive
        # until GC reaches __del__.
        if native_corpus is not None:
            native_corpus.close()
    if mngr is not None:
        mngr.wait_until_finished()
    return FitResult(state=state, losses=losses, steps_run=n_steps - start_step)


def _fit_loop(
    state, train_step, key, start_step, n_steps, batch_size, cfg,
    feature_kind, n_samples, angle_jitter_deg, reverb, interferer_kind,
    seed, corpus, native_corpus, teacher_fn, distill_alpha, mngr,
    checkpoint_every, log_every, log_fn,
):
    losses = []
    for i in range(start_step, n_steps):
        batch_key = jax.random.fold_in(key, i)
        if native_corpus is not None or corpus is not None:
            from azoom.train.data import mix_batch

            if native_corpus is not None:
                sources = native_corpus.next_batch()
            else:
                rng = np.random.default_rng(seed * 1_000_003 + i)
                sources = corpus.sample_batch(rng, 3 * batch_size, n_samples)
            batch = mix_batch(
                batch_key,
                jnp.asarray(sources.reshape(batch_size, 3, n_samples)),
                cfg, feature_kind,
                angle_jitter_deg=angle_jitter_deg, reverb=reverb,
            )
        else:
            batch = synth_batch(
                batch_key, batch_size, cfg, feature_kind, n_samples,
                angle_jitter_deg=angle_jitter_deg, reverb=reverb,
                interferer_kind=interferer_kind,
            )
        label = batch["label"]
        if teacher_fn is not None:
            label = (
                (1.0 - distill_alpha) * label
                + distill_alpha * teacher_fn(batch["features"])
            )
        state, loss = train_step(state, batch["features"], label)
        if (i + 1) % log_every == 0 or i == start_step:
            losses.append((i + 1, float(loss)))
            log_fn(f"[TRAIN] step {i + 1}/{n_steps} bce={float(loss):.4f}")
        if mngr is not None and ((i + 1) % checkpoint_every == 0 or i + 1 == n_steps):
            import orbax.checkpoint as ocp

            mngr.save(i + 1, args=ocp.args.StandardSave(state))
    return state, losses


def _abstract(tree, device=None):
    """ShapeDtypeStructs with an explicit single-device sharding so orbax
    restores cleanly even when the checkpoint was written on a different
    backend (TPU-written -> CPU-restored and vice versa)."""
    sharding = jax.sharding.SingleDeviceSharding(device or jax.devices()[0])
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            jnp.shape(x), jnp.result_type(x), sharding=sharding
        ),
        tree,
    )


def restore_checkpoint(checkpoint_dir, state_template, step: int | None = None):
    """Restore a TrainState from an orbax CheckpointManager directory onto
    the current default device. Returns (state, step)."""
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(Path(checkpoint_dir).absolute())
    step = int(mngr.latest_step()) if step is None else step
    restored = mngr.restore(step, args=ocp.args.StandardRestore(_abstract(state_template)))
    return jax.tree_util.tree_map(jnp.asarray, restored), step


def mask_accuracy(pred: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Binary mask accuracy at threshold 0.5 — the mask-quality eval the
    reference never wrote but whose behavior its SIR sweeps proxy."""
    return jnp.mean((pred > 0.5) == (label > 0.5))
