"""Batched closed-loop rollout engine.

Steps N simulated robots per device through the full perception->plan->act
loop (a new first-class component; BASELINE.json north star: >=4096 parallel
rollouts on a v5e-8, <10 ms per 30-step chunk). The entire replan period —
build batch from controller buffers, encode context once, 30-step DDIM (or
1-step distilled) chunk sampling, feed the chunk back into the buffers, and
``pred_len`` 50 Hz plant ticks — is ONE jitted function; multi-chunk rollouts
scan over it.

The plant is a deliberately simple first-order joint-tracking stub (commands
low-pass into positions, IMU follows a smooth sinusoid): this engine measures
serving capacity and closes the observation loop with the same buffer
semantics as the real robot (reference ros.py:205-257), it is not a physics
simulator.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data.normalizer import Normalizer
from soccerdiffusion_tpu.diffusion import DiffusionSchedule, solver_sample
from soccerdiffusion_tpu.inference.controller import (
    ControllerState,
    init_controller_state,
    make_controller_batch,
    observe,
    push_action_chunk,
)


def largest_dividing_block(configured: int, batch: int) -> int:
    """Largest block size <= ``configured`` that divides ``batch``.

    Every fused Pallas path (FusedDenoiser / FusedChunkSampler /
    FusedContextEncoder) requires ``batch % block == 0``; a plain
    ``min(configured, batch)`` can produce a non-dividing block (e.g.
    batch 48, block 32) that fails at trace time."""
    block = min(configured, batch)
    while batch % block:
        block -= 1
    return block


@struct.dataclass
class PlantState:
    positions: jnp.ndarray  # (B, J) joint positions, [-pi, pi] domain
    phase: jnp.ndarray  # (B,) sinusoid phase for the IMU stub


@struct.dataclass
class RolloutCarry:
    controller: ControllerState
    plant: PlantState
    rng: jax.Array


class RolloutEngine:
    def __init__(
        self,
        model,
        schedule: DiffusionSchedule,
        normalizer: Normalizer,
        num_inference_steps: int = 30,
        distilled: bool = False,
        tracking_alpha: float = 0.5,
        fused: bool | str = False,
        fused_block_robots: int = 8,
        fused_group_robots: int = 1,
        fused_encoder: bool | str = False,
        fused_encoder_block_robots: int = 16,
        fused_kv_quant: str = "none",
        replan_every: int | None = None,
        solver: str = "ddim",
        fused_interpret: bool = False,
        guidance_scale: float = 1.0,
        guidance_null: tuple[str, ...] = ("image",),
        cache_image_tokens: bool | None = None,
    ):
        self.model = model
        self.cfg: ModelConfig = model.config
        self.schedule = schedule
        self.normalizer = normalizer
        self.num_inference_steps = num_inference_steps
        self.distilled = distilled
        self.tracking_alpha = tracking_alpha
        # fused=False: XLA op graph. fused=True/"step": one Pallas program
        # per denoise step (ops/fused_denoise.py). fused="chunk": the WHOLE
        # multi-step chunk as one Pallas program (ops/fused_chunk.py) — the
        # serving headline path.
        self.fused = fused
        self.fused_block_robots = fused_block_robots
        # robots per flat block-diagonal attention inside the chunk kernel
        # (trades bounded FLOP waste for fewer MXU op issues; see
        # ops/fused_chunk.py)
        self.fused_group_robots = fused_group_robots
        # fused_encoder=True: encode the proprioceptive context with the
        # single-program Pallas encoder (ops/fused_encoder.py) instead of
        # the XLA op graph; "interpret" runs it in interpret mode (tests).
        self.fused_encoder = fused_encoder
        self.fused_encoder_block_robots = fused_encoder_block_robots
        # "int8": quantized context K/V inside the fused chunk kernel
        # (ops/fused_chunk.py context_kv_quant)
        self.fused_kv_quant = fused_kv_quant
        # Serving-side image-token cache (default ON for image configs):
        # per-frame ViT/ResNet encodings are computed once per FRAME
        # arrival (10 Hz stub camera) and rolled in the controller state;
        # replans run only the frame-sequence encoder. Numerically
        # identical to re-encoding the stack (models/vision.py mode
        # contract) at a fraction of the vision FLOPs per replan.
        self.cache_image_tokens = (
            self.cfg.use_images if cache_image_tokens is None
            else bool(cache_image_tokens))
        # run the fused Pallas samplers in interpret mode (CPU tests /
        # dryruns; production leaves this False)
        self.fused_interpret = fused_interpret
        # "ddim" (reference sampler) or "dpmpp" (DPM-Solver++(2M),
        # diffusion/dpm_solver.py): a training-free second-order solver that
        # matches ~30-step DDIM quality at ~10 steps. Either may carry an
        # "@lambda" spacing suffix (log-SNR-uniform timesteps — the spacing
        # dpmpp integrates well under; diffusion/dpm_solver.py:parse_solver).
        # Supported on the XLA sampler and the fused chunk kernel (same
        # in-kernel linear update, different host-side coefficient table).
        # The distilled and fused="step" paths are DDIM-trained / DDIM-only.
        from soccerdiffusion_tpu.diffusion import parse_solver

        parse_solver(solver)  # validates name and spacing
        if solver != "ddim" and (distilled or fused is True or fused == "step"):
            raise ValueError(
                "solver='dpmpp' is supported on the XLA sampler and the "
                "fused 'chunk' kernel; distilled students and the per-step "
                "fused denoiser are DDIM-trained/DDIM-only")
        self.solver = solver
        # Classifier-free guidance at serving time: each denoise step runs
        # the conditional AND a null-modality unconditional branch in one
        # doubled-batch pass and combines them as eps_u + w (eps_c - eps_u)
        # (evaluation/openloop.py documents the semantics; meaningful on
        # modality_dropout-trained checkpoints). XLA sampler path only —
        # the fused Pallas kernels and the distilled single forward reject
        # it (for the fused kernels, run w=1 or serve guided via the XLA
        # path at 2x batch).
        self.guidance_scale = float(guidance_scale)
        self.guidance_null = tuple(guidance_null)
        if self.guidance_scale != 1.0 and (distilled or fused):
            raise ValueError(
                "guidance_scale != 1 requires the XLA iterative sampler "
                "(fused=False, distilled=False)")
        if (self.guidance_scale != 1.0 and self.cache_image_tokens
                and self.cfg.use_images
                and ("image" in self.guidance_null
                     or "all" in self.guidance_null)):
            raise ValueError(
                "image-modality guidance cannot run against the image-token "
                "cache (tokens are encodings, the null is the zero FRAME); "
                "pass cache_image_tokens=False")
        if self.guidance_scale != 1.0:
            from soccerdiffusion_tpu.data.pipeline import (
                inactive_guidance_modalities, null_modalities)

            # validate modality names eagerly, not at first replan
            null_modalities({}, self.guidance_null)
            inactive = inactive_guidance_modalities(self.cfg,
                                                    self.guidance_null)
            if inactive:
                from soccerdiffusion_tpu import logger

                logger.warning(
                    f"guidance over {inactive} is a no-op: the model config "
                    "does not condition on those modalities — the doubled-"
                    "batch CFG cost buys an unguided sample")
        # Receding-horizon control: replan after `replan_every` of the
        # chunk's pred_len ticks instead of playing the whole chunk. The
        # reference replans only at chunk boundaries (every pred_len/50 s =
        # 200 ms, ros.py:156-159); with the fused samplers a replan costs
        # ~1 ms at deployment batches (docs/perf_notes.md latency ladder),
        # so the loop can replan at up to the full 50 Hz control rate
        # (replan_every=1). Only the executed prefix of each chunk enters
        # the action-history buffer and the plant. Default: pred_len
        # (reference behavior).
        P = self.cfg.trajectory_prediction_length
        self.replan_every = P if replan_every is None else int(replan_every)
        if not 1 <= self.replan_every <= P:
            raise ValueError(
                f"replan_every must be in [1, pred_len={P}], "
                f"got {replan_every}")
        if self.cfg.use_images and self.replan_every % 5 != 0:
            raise ValueError(
                "image configs need replan_every to be a multiple of 5 "
                "ticks so the 10 Hz stub camera (one frame per 5 ticks at "
                "50 Hz) stays on schedule across replan periods; got "
                f"replan_every={replan_every}")

    # ------------------------------------------------------------------ init

    def init(self, batch_size: int, rng: jax.Array,
             variables=None) -> RolloutCarry:
        """``variables``: when the image-token cache is active, pass the
        model variables to prefill the token buffer with the ZERO-frame
        encoding — exact parity with the raw path's zero-image buffers
        (reference ros.py:88-106 zero init) from the very first replan.
        Without it the cache starts at zero TOKENS and warms up over the
        first image_context_length frames."""
        controller = init_controller_state(
            self.cfg, batch_size,
            cache_image_tokens=self.cache_image_tokens)
        if controller.image_tokens is not None and variables is not None:
            res = self.cfg.image_resolution
            zero_tok = self.model.apply(
                variables, jnp.zeros((1, 1, res, res, 3)),
                method=self.model.encode_image_frames)  # (1, 1, hidden)
            controller = controller.replace(image_tokens=jnp.broadcast_to(
                zero_tok.astype(controller.image_tokens.dtype),
                controller.image_tokens.shape))
        return RolloutCarry(
            controller=controller,
            plant=PlantState(
                positions=jnp.zeros((batch_size, self.cfg.num_joints)),
                phase=jnp.linspace(0.0, 2 * jnp.pi, batch_size, endpoint=False),
            ),
            rng=rng,
        )

    # ----------------------------------------------------------- one replan

    def _sample_chunk(self, variables, controller: ControllerState, rng) -> jnp.ndarray:
        batch = make_controller_batch(self.cfg, controller)
        if self.fused_encoder and self.cfg.use_images:
            raise ValueError(
                "fused_encoder covers the proprioceptive encoder stacks only; "
                "image configs must use the XLA context encoder "
                "(fused_encoder=False) — the image tokens come from the "
                "ViT/ResNet which is already matmul-dominated")
        if self.fused_encoder:
            from soccerdiffusion_tpu.ops.fused_encoder import FusedContextEncoder

            bsz = batch[next(iter(batch))].shape[0]
            enc = FusedContextEncoder(
                self.model, variables["params"],
                interpret=self.fused_encoder == "interpret",
                block_robots=largest_dividing_block(
                    self.fused_encoder_block_robots, bsz),
            )
            encode_fn = enc.encode
        else:
            def encode_fn(b):
                return self.model.apply(variables, b, False,
                                        method=self.model.encode_context)
        context = encode_fn(batch)
        bsz = context.shape[0]
        shape = (bsz, self.cfg.trajectory_prediction_length, self.cfg.num_joints)
        noise = jax.random.normal(rng, shape, dtype=jnp.float32)
        if self.distilled and self.fused:
            # Distilled single forward at t=0 through the fused kernel (the
            # student's output IS the trajectory; reference ros.py:293-298).
            from soccerdiffusion_tpu.ops.fused_denoise import FusedDenoiser

            fused = FusedDenoiser(
                self.model, variables["params"],
                interpret=self.fused_interpret,
                block_robots=largest_dividing_block(self.fused_block_robots, bsz))
            context_kv = self.model.apply(variables, context,
                                          method=self.model.precompute_context_kv)
            packed = fused.pack_context_kv(context_kv)
            st = self.model.apply(
                variables, jnp.zeros((1,), jnp.int32),
                method=lambda m, tt: m.step_encoding(tt),
            )[0, 0]
            traj = fused(packed, noise, st)
        elif self.distilled:
            traj = self.model.apply(
                variables, context, noise, jnp.zeros((bsz,), jnp.int32),
                method=self.model.denoise,
            )
        elif self.fused == "chunk":
            from soccerdiffusion_tpu.diffusion import parse_solver, solver_timesteps
            from soccerdiffusion_tpu.ops.fused_chunk import FusedChunkSampler

            block = largest_dividing_block(self.fused_block_robots, bsz)
            # largest configured group that divides the (possibly
            # batch-shrunk) block
            group = largest_dividing_block(self.fused_group_robots, block)
            fused = FusedChunkSampler(self.model, variables["params"],
                                      interpret=self.fused_interpret,
                                      block_robots=block, group_robots=group,
                                      context_kv_quant=self.fused_kv_quant)
            # raw context goes straight in — K/V projection happens in-kernel;
            # the step-token table rides the SAME timestep sequence the
            # solver coefficient table is built on
            ts = jnp.asarray(solver_timesteps(
                self.schedule, self.num_inference_steps,
                parse_solver(self.solver)[1]))
            st_table = self.model.apply(
                variables, ts, method=lambda m, tt: m.step_encoding(tt)
            )[:, 0]  # (T, E)
            traj = fused.sample(context, noise, st_table, self.schedule,
                                self.num_inference_steps, solver=self.solver)
        elif self.fused:
            from soccerdiffusion_tpu.diffusion.ddim import ddim_timesteps
            from soccerdiffusion_tpu.ops.fused_denoise import FusedDenoiser

            fused = FusedDenoiser(
                self.model, variables["params"],
                interpret=self.fused_interpret,
                block_robots=largest_dividing_block(self.fused_block_robots, bsz))
            context_kv = self.model.apply(variables, context,
                                          method=self.model.precompute_context_kv)
            packed = fused.pack_context_kv(context_kv)
            # Step tokens for the whole timestep sequence in one op — they
            # are robot-independent during sampling.
            ts = jnp.asarray(ddim_timesteps(
                self.schedule.num_train_timesteps, self.num_inference_steps))
            st_table = self.model.apply(
                variables, ts, method=lambda m, tt: m.step_encoding(tt)
            )[:, 0]  # (T, E)
            traj = fused.sample(packed, noise, st_table, self.schedule,
                                self.num_inference_steps)
        elif self.guidance_scale != 1.0:
            from soccerdiffusion_tpu.data.pipeline import null_modalities

            # CFG: stack the conditional and null-modality contexts along
            # the batch axis so each step is ONE doubled-batch denoiser pass.
            # BOTH branches go through the same encode_fn (advisor r3: a
            # fused-encoder conditional vs XLA unconditional would leak any
            # encoder numeric gap into eps_c - eps_u).
            ctx_u = encode_fn(null_modalities(batch, self.guidance_null))
            ctx2 = jnp.concatenate([context, ctx_u], axis=0)
            context_kv = self.model.apply(variables, ctx2,
                                          method=self.model.precompute_context_kv)
            w = self.guidance_scale

            def denoise_fn(x, t):
                eps2 = self.model.apply(
                    variables, context_kv, jnp.concatenate([x, x], axis=0),
                    jnp.full((2 * bsz,), t, dtype=jnp.int32),
                    method=self.model.denoise_with_kv,
                )
                return eps2[bsz:] + w * (eps2[:bsz] - eps2[bsz:])

            traj = solver_sample(self.schedule, denoise_fn, noise,
                                 self.num_inference_steps, solver=self.solver)
        else:
            context_kv = self.model.apply(variables, context,
                                          method=self.model.precompute_context_kv)

            def denoise_fn(x, t):
                return self.model.apply(
                    variables, context_kv, x, jnp.full((bsz,), t, dtype=jnp.int32),
                    method=self.model.denoise_with_kv,
                )

            traj = solver_sample(self.schedule, denoise_fn, noise,
                                 self.num_inference_steps, solver=self.solver)
        return self.normalizer.denormalize(traj)  # [0, 2*pi) domain

    def _plant_tick(self, plant: PlantState, command: jnp.ndarray) -> tuple[PlantState, jnp.ndarray, jnp.ndarray]:
        """First-order tracking toward the command; returns (plant, joint_state, imu)."""
        target = command - jnp.pi  # back to symmetric domain
        positions = plant.positions + self.tracking_alpha * (target - plant.positions)
        phase = plant.phase + 0.02
        if self.cfg.imu_input_dim == 4:
            # Small-angle rotation about x as a quaternion (xyzw).
            half = 0.05 * jnp.sin(phase)
            imu = jnp.stack(
                [jnp.sin(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.cos(half)],
                axis=-1,
            )
        else:
            angle = 0.1 * jnp.sin(phase)
            ax = jnp.stack(
                [jnp.ones_like(angle), jnp.zeros_like(angle), jnp.zeros_like(angle)], axis=-1
            )
            imu = jnp.concatenate(
                [ax, jnp.sin(angle)[:, None], jnp.cos(angle)[:, None]], axis=-1
            )
        return PlantState(positions=positions, phase=phase), positions, imu

    def _plant_play_chunk(self, plant: PlantState, chunk: jnp.ndarray) -> tuple[PlantState, jnp.ndarray, jnp.ndarray]:
        """All of the chunk's plant ticks in closed form.

        The tracking recurrence p_{k+1} = p_k + a*(t_k - p_k) is linear, so
        every tick's position is one (P, P) matmul over the chunk dimension
        plus a decayed initial-state term — a handful of vectorized ops
        instead of per-tick unrolled iterations (the serving runtime
        charges each op a fixed dispatch cost; docs/perf_notes.md). Matches
        ``_plant_tick`` iterated, up to float reassociation. ``chunk`` may
        be any length (receding horizon plays only a prefix)."""
        P = chunk.shape[1]
        a = self.tracking_alpha
        beta = 1.0 - a
        k = np.arange(1, P + 1)
        decay = jnp.asarray(beta ** k, dtype=chunk.dtype)  # (P,) beta^{k}
        j = np.arange(P)
        m = a * beta ** (k[:, None] - 1 - j[None, :])
        m = jnp.asarray(np.where(j[None, :] <= k[:, None] - 1, m, 0.0),
                        dtype=chunk.dtype)  # (P, P) lower-tri response matrix
        targets = chunk - jnp.pi  # back to symmetric domain
        positions = (decay[None, :, None] * plant.positions[:, None, :]
                     + jnp.einsum("pk,bkj->bpj", m, targets))  # (B, P, J)

        phases = plant.phase[:, None] + 0.02 * k[None, :]  # (B, P)
        if self.cfg.imu_input_dim == 4:
            half = 0.05 * jnp.sin(phases)
            z = jnp.zeros_like(half)
            imus = jnp.stack([jnp.sin(half), z, z, jnp.cos(half)], axis=-1)
        else:
            angle = 0.1 * jnp.sin(phases)
            ax = jnp.stack([jnp.ones_like(angle), jnp.zeros_like(angle),
                            jnp.zeros_like(angle)], axis=-1)
            imus = jnp.concatenate(
                [ax, jnp.sin(angle)[..., None], jnp.cos(angle)[..., None]], axis=-1
            )
        new_plant = PlantState(positions=positions[:, -1], phase=phases[:, -1])
        return new_plant, positions, imus

    def replan_period(self, variables, carry: RolloutCarry) -> tuple[RolloutCarry, jnp.ndarray]:
        """One replan period: sample a chunk, play its first
        ``replan_every`` ticks (all pred_len by default) while feeding
        plant observations back into the buffers. Returns the EXECUTED
        prefix (B, replan_every, J).

        The plant trajectory for the executed ticks is computed in closed
        form (``_plant_play_chunk``) and all observation rows land in the
        controller buffers as ONE update per modality (``observe_many``) —
        the same semantics as tick-by-tick ``observe`` calls. Only the
        executed prefix enters the action-history buffer: under receding
        horizon the buffer records commands actually issued (the
        reference's full-chunk append, ros.py:315-318, is the
        replan_every == pred_len case)."""
        from soccerdiffusion_tpu.inference.controller import observe_many

        rng, sub = jax.random.split(carry.rng)
        chunk = self._sample_chunk(variables, carry.controller, sub)
        executed = chunk[:, : self.replan_every]
        controller = push_action_chunk(carry.controller, executed)

        plant, js_rows, imu_rows = self._plant_play_chunk(carry.plant, executed)
        frames = None
        if self.cfg.use_images:
            # The stub camera delivers one frame per 5 plant ticks (10 Hz at
            # the 50 Hz control rate, reference ros.py:162-163): frame i of
            # n lands on tick P-1-5*(n-1-i), and its phase is sampled at that
            # instant from the per-tick phase trajectory. A cheap
            # phase-dependent gradient, already ImageNet-normalized scale.
            # (replan_every % 5 == 0 is enforced at construction, so the
            # camera stays exactly on its 10 Hz schedule.)
            P = self.replan_every
            n_frames = max(1, P // 5)
            res = self.cfg.image_resolution
            ramp = jnp.linspace(-1.0, 1.0, res)
            frame_offsets = 0.02 * 5.0 * np.arange(n_frames - 1, -1, -1)
            ph = (plant.phase[:, None]
                  - jnp.asarray(frame_offsets))[:, :, None, None, None]
            base = (ramp[None, None, :, None, None]
                    + ramp[None, None, None, :, None])  # (1,1,H,W,1)
            frames = jnp.broadcast_to(
                jnp.sin(base + ph), (ph.shape[0], n_frames, res, res, 1))
            frames = jnp.repeat(frames, 3, axis=-1)
        frame_tokens = None
        if frames is not None and carry.controller.image_tokens is not None:
            # token cache: encode ONLY the frames that arrived this period
            # (n_frames per replan vs the full image_context_length stack
            # the raw path re-encodes inside encode_context every replan)
            frame_tokens = self.model.apply(
                variables, frames, method=self.model.encode_image_frames)
            frames = None
        controller = observe_many(controller, joint_states=js_rows,
                                  imus=imu_rows, images=frames,
                                  image_tokens=frame_tokens)
        return RolloutCarry(controller=controller, plant=plant, rng=rng), executed

    # --------------------------------------------------------------- rollout

    def make_rollout_fn(self, num_chunks: int, jit: bool = True):
        """Returns ``rollout(variables, carry) -> (carry, chunks)`` executing
        ``num_chunks`` replan periods; chunks has shape
        (num_chunks, B, replan_every, J) — replan_every == pred_len unless
        receding-horizon replanning is configured."""

        def rollout(variables, carry):
            def body(c, _):
                c, chunk = self.replan_period(variables, c)
                return c, chunk

            return jax.lax.scan(body, carry, None, length=num_chunks)

        return jax.jit(rollout, donate_argnums=(1,)) if jit else rollout

    def make_sharded_rollout_fn(self, num_chunks: int, mesh, axis: str = "data"):
        """Fleet scale-out: the whole rollout runs per-device via shard_map
        with robots sharded over ``axis``.

        The XLA sampler path partitions under plain jit (GSPMD), but a
        Pallas program is a single-device primitive — multi-chip serving of
        the fused chunk/denoise kernels needs the per-device SPMD form.
        Robots are independent, so there are no collectives at all: each
        device runs its own fused sampler on its robot shard over ICI-free
        local work. Each shard folds its ``axis`` index into the carry RNG
        (shards draw independent chunk noise); per-shard computation is
        bit-identical to an unsharded rollout over that shard's robots with
        the folded key (tests/test_inference.py::TestShardedFusedServing).
        The returned carry's RNG is re-derived from the incoming replicated
        key, so repeated calls chain fresh noise and the carry stays
        identically replicated.
        """
        from jax.sharding import PartitionSpec as P

        shard_map = jax.shard_map

        base = self.make_rollout_fn(num_chunks, jit=False)

        def body(variables, carry):
            idx = jax.lax.axis_index(axis)
            local = carry.replace(rng=jax.random.fold_in(carry.rng, idx))
            out, chunks = base(variables, local)
            # advance the REPLICATED key for the next call
            out = out.replace(rng=jax.random.split(carry.rng)[0])
            return out, chunks

        def sharded(variables, carry):
            carry_specs = RolloutCarry(
                controller=jax.tree.map(lambda _: P(axis), carry.controller),
                plant=jax.tree.map(lambda _: P(axis), carry.plant),
                rng=P(),
            )
            # check_vma off: pallas_call does not carry the
            # varying-mesh-axes annotation the replication checker needs
            fn = shard_map(
                body, mesh=mesh,
                in_specs=(jax.tree.map(lambda _: P(), variables), carry_specs),
                out_specs=(carry_specs, P(None, axis)),
                check_vma=False,
            )
            return fn(variables, carry)

        return jax.jit(sharded, donate_argnums=(1,))
