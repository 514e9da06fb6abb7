"""Quality report: one command -> JSON + markdown quality ledger.

Evaluates a teacher checkpoint and any number of distilled students on the
same held-out windows and identical noise streams, producing the evidence
the speed headlines rest on:

  * open-loop MSE/MAE vs ground truth (per checkpoint, reference
    plot.py:106-169 semantics, recorded instead of plotted)
  * open-loop agreement vs the teacher (the distillation objective,
    reference distill.py:198, measured)
  * closed-loop rollout divergence vs the teacher under feedback
  * the teacher's own noise-resampling self-consistency as the yardstick

  python -m soccerdiffusion_tpu.evaluation.report --teacher t.ckpt \
      [--student s4.ckpt --student s1.ckpt] [--dummy-data | --db path] \
      [--windows 256] [--chunks 10] [--out quality_report]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu import logger
from soccerdiffusion_tpu.config import Config
from soccerdiffusion_tpu.diffusion import make_schedule, solver_label
from soccerdiffusion_tpu.evaluation.divergence import (
    closed_loop_divergence,
    self_consistency,
)
from soccerdiffusion_tpu.evaluation.openloop import (
    CONTEXT_KEYS,
    IMAGE_KEYS,
    context_sensitivity,
    held_out_indices,
    open_loop_metrics,
    sampler_agreement,
)
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.training.checkpoint import load_policy_checkpoint


def _load(path: str, prefer_ema: bool = True):
    """Load a checkpoint -> (hyperparams, variables, normalizer, sampler spec).

    Delegates to the shared decoder so report and `cli serve` agree on the
    step count and weight choice (EMA when the checkpoint carries it;
    training/checkpoint.py:load_policy_checkpoint)."""
    return load_policy_checkpoint(path, prefer_ema=prefer_ema)


def markdown_report(result: dict) -> str:
    lines = ["# Quality report", ""]
    lines.append(f"- windows: {result['num_windows']}, closed-loop chunks: "
                 f"{result['closed_loop_chunks']}, batch {result['batch_size']}")
    lines.append("")
    lines.append("| checkpoint | sampler | open-loop MSE | open-loop MAE | "
                 "vs-teacher MSE | closed-loop mean div (rad) | final div (rad) |")
    lines.append("|---|---|---|---|---|---|---|")
    for entry in result["checkpoints"]:
        o = entry["open_loop"]
        a = entry.get("agreement") or {}
        d = entry.get("divergence") or {}
        lines.append(
            f"| {entry['name']} | {o['sampler']} | {o['mse']:.5f} | "
            f"{o['mae']:.5f} | "
            f"{a.get('mse_vs_teacher', float('nan')):.5f} | "
            f"{d.get('mean_divergence_rad', float('nan')):.5f} | "
            f"{d.get('final_divergence_rad', float('nan')):.5f} |"
        )
    sc = result.get("teacher_self_consistency")
    if sc:
        lines += ["", f"Teacher noise-resampling self-consistency (mean "
                      f"closed-loop divergence against itself with a "
                      f"different noise stream): "
                      f"**{sc['mean_divergence_rad']:.5f} rad** — student "
                      f"divergence at or below this is sampling noise."]
    nf = result.get("noise_floor_mse")
    if nf is not None:
        lines += ["", f"Pure-noise open-loop MSE floor: **{nf:.5f}** (a "
                      f"sampler must land well below this to have learned "
                      f"anything)."]
    cs = result.get("context_sensitivity")
    if cs:
        rows = ", ".join(
            f"t={frac}: {v['ratio']:.2f}" for frac, v in cs["per_t"].items())
        lines += ["", f"Teacher context sensitivity (shuffled/true eps-MSE "
                      f"ratio; >1 means the context is used): {rows} — "
                      f"min **{cs['min_ratio']:.2f}**."]
    ims = result.get("image_sensitivity")
    if ims:
        rows = ", ".join(
            f"t={frac}: {v['ratio']:.2f}" for frac, v in ims["per_t"].items())
        lines += ["", f"Teacher IMAGE sensitivity (image-only shuffle, other "
                      f"modalities honest; shuffled/true eps-MSE ratio): "
                      f"{rows} — min **{ims['min_ratio']:.2f}**."]
    iso = result.get("image_shuffled_open_loop")
    if iso:
        lines += ["", f"Open-loop MSE with SHUFFLED images: "
                      f"**{iso['mse']:.5f}** vs {iso['true_mse']:.5f} true "
                      f"(ratio {iso['mse_ratio_shuffled_over_true']:.2f}x) — "
                      f"the camera's trajectory-level contribution."]
    ibs = result.get("image_sensitivity_boundary")
    if ibs:
        rows = ", ".join(
            f"t={frac}: {v['ratio']:.2f}" for frac, v in ibs["per_t"].items())
        lines += ["", f"BOUNDARY-window image sensitivity (only windows "
                      f"where a frame just became visible — the camera's "
                      f"undiluted contribution): {rows} — min "
                      f"**{ibs['min_ratio']:.2f}**."]
    ibo = result.get("image_shuffled_open_loop_boundary")
    if ibo:
        lines += ["", f"Boundary-window open-loop MSE: true "
                      f"**{ibo['true_mse']:.5f}** vs shuffled-images "
                      f"{ibo['mse']:.5f} "
                      f"(ratio {ibo['mse_ratio_shuffled_over_true']:.2f}x; "
                      f"noise floor {ibo['noise_floor_mse']:.5f}; "
                      f"{ibo['num_windows']} windows)."]
    g = result.get("guidance")
    if g:
        lines += ["", "Classifier-free guidance on the teacher "
                      "(eps_u + w (eps_c - eps_u); unconditional branch "
                      "nulls the listed modalities):", "",
                  "| guidance | held-out MSE | boundary MSE | boundary "
                  "shuffled-img MSE | boundary ratio |",
                  "|---|---|---|---|---|"]
        base = g[0].get("true_mse", float("nan"))
        bt = result.get("image_shuffled_open_loop_boundary", {})
        lines.append(f"| w=1 (unguided) | {base:.5f} | "
                     f"{bt.get('true_mse', float('nan')):.5f} | "
                     f"{bt.get('mse', float('nan')):.5f} | "
                     f"{bt.get('mse_ratio_shuffled_over_true', float('nan')):.2f}x |")
        for row in g:
            lines.append(
                f"| {row['sampler']} | {row['mse']:.5f} | "
                f"{row.get('boundary_mse', float('nan')):.5f} | "
                f"{row.get('boundary_shuffled_mse', float('nan')):.5f} | "
                f"{row.get('boundary_ratio_shuffled_over_true', float('nan')):.2f}x |")
    pm = result.get("posterior_mean_boundary")
    if pm:
        lines += ["", f"POSTERIOR-MEAN boundary open loop (K={pm['k']} "
                      f"sampled trajectories averaged per context — the "
                      f"estimator class the Bayes-oracle rows use; a single "
                      f"draw's posterior variance inflates both sides of "
                      f"the single-draw ratios above; "
                      f"{pm['num_windows']} windows; NFE/replan = denoiser "
                      f"evaluations per served action chunk — the serving "
                      f"cost of the row):", "",
                  "| checkpoint | sampler | NFE/replan | true MSE | "
                  "shuffled-img MSE | ratio |",
                  "|---|---|---|---|---|---|"]
        for row in pm["rows"]:
            lines.append(f"| {row.get('name', 'teacher')} | {row['sampler']} "
                         f"| {row.get('nfe', '?')} | {row['true_mse']:.5f} | "
                         f"{row['shuffled_mse']:.5f} | "
                         f"**{row['ratio_shuffled_over_true']:.2f}x** |")
    orc = result.get("oracle_open_loop")
    if orc:
        lines += ["", f"Bayes-oracle calibration (known plant, same "
                      f"windows; evaluation/oracle.py): cued "
                      f"**{orc['mse_cued']:.5f}** vs blind "
                      f"{orc['mse_blind']:.5f} (achievable ratio "
                      f"**{orc['ratio_blind_over_cued']:.2f}x**) — the "
                      f"ceiling for the shuffled/true ratios above."]
    orb = result.get("oracle_open_loop_boundary")
    if orb:
        lines += ["", f"Boundary-window oracle: cued "
                      f"**{orb['mse_cued']:.5f}** vs blind "
                      f"{orb['mse_blind']:.5f} (achievable ratio "
                      f"**{orb['ratio_blind_over_cued']:.2f}x**, "
                      f"{orb['num_windows']} windows)."]
    return "\n".join(lines) + "\n"


def run_report(teacher: str, students: list[str], dataset, windows: int,
               chunks: int, batch_size: int, seed: int = 0,
               teacher_loaded: tuple | None = None,
               solver_rows: list[tuple[str, int]] = (),
               raw_weights: bool = False,
               guidance_rows: list[tuple[float, tuple[str, ...]]] = (),
               posterior_mean_k: int = 0) -> dict:
    """``solver_rows``: extra (solver, steps) rows evaluated on the TEACHER
    checkpoint — training-free few-step samplers (e.g. ("dpmpp", 10),
    diffusion/dpm_solver.py), ranked with the same open-loop/agreement/
    closed-loop metrics as the distilled students.
    ``raw_weights`` evaluates the raw params of EMA checkpoints (ablation).
    ``guidance_rows``: (scale, null-modalities) classifier-free-guidance
    rows on the teacher (evaluation/openloop.py sample_trajectories) —
    held-out + boundary-window open-loop MSE per row, read against the
    unguided teacher and the oracle ceiling."""
    prefer_ema = not raw_weights
    t_params, t_vars, normalizer, t_steps, t_distilled = (
        teacher_loaded if teacher_loaded is not None
        else _load(teacher, prefer_ema))
    config = Config.from_dict(t_params)
    model = DiffusionPolicy(config.model)
    schedule = make_schedule(config.train.train_denoising_timesteps)
    indices = held_out_indices(len(dataset), windows, seed)

    result = {
        "teacher": teacher,
        "num_windows": int(len(indices)),
        "closed_loop_chunks": chunks,
        "batch_size": batch_size,
        "checkpoints": [],
    }
    logger.info(f"open-loop eval: teacher ({t_steps} steps)")
    t_open = open_loop_metrics(model, t_vars, normalizer, schedule, dataset,
                               indices, t_steps, t_distilled,
                               batch_size=batch_size, seed=seed)
    result["noise_floor_mse"] = t_open.pop("noise_floor_mse")
    result["checkpoints"].append(
        {"name": Path(teacher).name, "open_loop": t_open})
    logger.info("context sensitivity: teacher")
    # Camera-specific evidence for image models: permute ONLY the image
    # modality (every other conditioning stream stays honest) at both the
    # eps level (context_sensitivity variant — shares the true-side pass
    # with the all-context probe) and the trajectory level (open-loop MSE
    # with shuffled images vs the true run above).
    sens_variants = {"context": CONTEXT_KEYS}
    if config.model.use_images:
        sens_variants["image"] = IMAGE_KEYS
    sens = context_sensitivity(
        model, t_vars, normalizer, schedule, dataset, indices,
        batch_size=batch_size, seed=seed, variants=sens_variants)
    result["context_sensitivity"] = sens["context"]

    if config.model.use_images:
        result["image_sensitivity"] = sens["image"]
        logger.info("image-shuffled open loop: teacher")
        shuf_open = open_loop_metrics(
            model, t_vars, normalizer, schedule, dataset, indices, t_steps,
            t_distilled, batch_size=batch_size, seed=seed,
            shuffle_keys=IMAGE_KEYS)
        result["image_shuffled_open_loop"] = {
            "mse": shuf_open["mse"], "mae": shuf_open["mae"],
            "true_mse": t_open["mse"],
            "mse_ratio_shuffled_over_true":
                shuf_open["mse"] / t_open["mse"] if t_open["mse"] > 0
                else float("nan"),
        }
        # Boundary-restricted probes: only the windows where a frame has
        # JUST become visible. On camera-cued data these are the windows
        # whose future the newest image alone explains (history still
        # shows the previous cue) — mid-interval windows dilute the
        # averaged ratio because proprioceptive history already reveals
        # the target there (data/dataset.py image_boundary_indices).
        if hasattr(dataset, "image_boundary_indices"):
            b_all = dataset.image_boundary_indices()
            if len(b_all):
                rng = np.random.default_rng(seed + 5)
                b_idx = np.sort(rng.permutation(b_all)[:len(indices)])
                logger.info(f"boundary-window image probes: teacher "
                            f"({len(b_idx)} windows)")
                bs = context_sensitivity(
                    model, t_vars, normalizer, schedule, dataset, b_idx,
                    batch_size=batch_size, seed=seed, keys=IMAGE_KEYS)
                result["image_sensitivity_boundary"] = bs
                bt = open_loop_metrics(
                    model, t_vars, normalizer, schedule, dataset, b_idx,
                    t_steps, t_distilled, batch_size=batch_size, seed=seed)
                bsh = open_loop_metrics(
                    model, t_vars, normalizer, schedule, dataset, b_idx,
                    t_steps, t_distilled, batch_size=batch_size, seed=seed,
                    shuffle_keys=IMAGE_KEYS)
                result["image_shuffled_open_loop_boundary"] = {
                    "num_windows": int(len(b_idx)),
                    "mse": bsh["mse"], "mae": bsh["mae"],
                    "true_mse": bt["mse"],
                    "noise_floor_mse": bt["noise_floor_mse"],
                    "mse_ratio_shuffled_over_true":
                        bsh["mse"] / bt["mse"] if bt["mse"] > 0
                        else float("nan"),
                }
        # Bayes-oracle calibration (vision dummy task only): the achievable
        # cued/blind open-loop errors from the known plant, on the SAME
        # windows — the ceiling the shuffled/true ratios above should be
        # read against (evaluation/oracle.py).
        recs = getattr(dataset, "dummy_recordings", None)
        if recs and getattr(recs[0], "vision_u", None) is not None:
            from soccerdiffusion_tpu.evaluation.oracle import (
                vision_oracle_open_loop,
            )

            logger.info("vision Bayes-oracle calibration")
            result["oracle_open_loop"] = vision_oracle_open_loop(
                dataset, indices, seed=seed)
            if hasattr(dataset, "image_boundary_indices"):
                b_all = dataset.image_boundary_indices()
                if len(b_all):
                    rng = np.random.default_rng(seed + 5)
                    b_idx = np.sort(rng.permutation(b_all)[:len(indices)])
                    result["oracle_open_loop_boundary"] = (
                        vision_oracle_open_loop(dataset, b_idx, seed=seed))

    if guidance_rows and t_distilled:
        logger.warning("guidance rows skipped: the teacher checkpoint is a "
                       "distilled single-forward student (no score to guide)")
    elif guidance_rows:
        b_idx = None
        if hasattr(dataset, "image_boundary_indices"):
            b_all = dataset.image_boundary_indices()
            if len(b_all):
                rng = np.random.default_rng(seed + 5)
                b_idx = np.sort(rng.permutation(b_all)[:len(indices)])
        result["guidance"] = []
        for scale, mods in guidance_rows:
            logger.info(f"CFG open loop: scale {scale}, null {list(mods)}")
            g_open = open_loop_metrics(
                model, t_vars, normalizer, schedule, dataset, indices,
                t_steps, t_distilled, batch_size=batch_size, seed=seed,
                guidance_scale=scale, guidance_null=mods)
            row = {"scale": scale, "null": list(mods),
                   "sampler": g_open["sampler"],
                   "mse": g_open["mse"], "mae": g_open["mae"],
                   "true_mse": t_open["mse"]}
            if b_idx is not None:
                g_b = open_loop_metrics(
                    model, t_vars, normalizer, schedule, dataset, b_idx,
                    t_steps, t_distilled, batch_size=batch_size, seed=seed,
                    guidance_scale=scale, guidance_null=mods)
                row["boundary_mse"] = g_b["mse"]
                row["boundary_mae"] = g_b["mae"]
                if "image" in mods:
                    # the camera's trajectory-level contribution UNDER the
                    # guided sampler: same guidance, images shuffled across
                    # the batch — apples-to-apples with boundary_mse
                    g_bs = open_loop_metrics(
                        model, t_vars, normalizer, schedule, dataset, b_idx,
                        t_steps, t_distilled, batch_size=batch_size,
                        seed=seed, shuffle_keys=IMAGE_KEYS,
                        guidance_scale=scale, guidance_null=mods)
                    row["boundary_shuffled_mse"] = g_bs["mse"]
                    row["boundary_ratio_shuffled_over_true"] = (
                        g_bs["mse"] / g_b["mse"] if g_b["mse"] > 0
                        else float("nan"))
            result["guidance"].append(row)

    def eval_row(name, s_vars, s_steps, s_distilled, solver="ddim"):
        """One non-teacher row: open-loop vs ground truth, agreement and
        closed-loop divergence vs the teacher (distilled students and
        training-free solver rows share this path exactly)."""
        logger.info(f"open-loop eval: {name}")
        s_open = open_loop_metrics(model, s_vars, normalizer, schedule,
                                   dataset, indices, s_steps, s_distilled,
                                   batch_size=batch_size, seed=seed,
                                   solver=solver)
        s_open.pop("noise_floor_mse")
        agreement = sampler_agreement(model, t_vars, s_vars, normalizer,
                                      schedule, dataset, indices, t_steps,
                                      s_steps, s_distilled,
                                      batch_size=batch_size, seed=seed,
                                      student_solver=solver)
        logger.info(f"closed-loop divergence: {name} vs teacher")
        divergence = closed_loop_divergence(
            model, t_vars, s_vars, schedule, normalizer, t_steps, s_steps,
            s_distilled, batch_size=min(batch_size, 64), num_chunks=chunks,
            seed=seed, student_solver=solver)
        result["checkpoints"].append({
            "name": name, "open_loop": s_open, "agreement": agreement,
            "divergence": divergence,
        })

    loaded_students = []
    for spath in students:
        s_params, s_vars, _, s_steps, s_distilled = _load(spath, prefer_ema)
        eval_row(Path(spath).name, s_vars, s_steps, s_distilled)
        loaded_students.append((Path(spath).name, s_vars, s_steps, s_distilled))

    for solver, steps in solver_rows:
        eval_row(f"teacher+{solver_label(solver, steps)}", t_vars, steps,
                 False, solver=solver)

    if (posterior_mean_k > 1
            and getattr(config.model, "use_images", False)
            and hasattr(dataset, "image_boundary_indices")
            and len(dataset.image_boundary_indices())):
        # Posterior-mean estimator on the boundary windows: average K
        # sampled trajectories per context before the MSE. The Bayes-oracle
        # rows are conditional MEANS, while a single diffusion draw carries
        # the full posterior variance — variance that inflates BOTH the
        # true-image and shuffled-image MSE and so dilutes their ratio.
        # Averaging matches the estimator classes; rows are labelled
        # xmeanK and recorded alongside (never instead of) the single-draw
        # rows above. Every checkpoint gets rows — INCLUDING distilled /
        # few-step students (their independent start noises are the draws;
        # a posterior-mean-distilled student's draws collapse toward the
        # mean, which is exactly the deployable behavior being evidenced)
        # — and each row carries its serving cost as `nfe` (denoiser
        # evaluations per replan: steps x draws, x2 under CFG), so a
        # "deployable" claim can be read directly off the ledger.
        b_all = dataset.image_boundary_indices()
        rng = np.random.default_rng(seed + 5)
        b_idx = np.sort(rng.permutation(b_all)[:len(indices)])
        pm_rows = []

        def pm_row(name, vars_, steps, distilled, k, scale=1.0, mods=()):
            label = f"K={k}" + (f" cfg{scale:g}" if scale != 1.0 else "")
            logger.info(f"posterior-mean boundary open loop: {name} {label}")
            kw = dict(batch_size=batch_size, seed=seed)
            if k > 1:
                kw["mean_of"] = k
            if scale != 1.0:
                kw.update(guidance_scale=scale, guidance_null=mods)
            pm_t = open_loop_metrics(model, vars_, normalizer, schedule,
                                     dataset, b_idx, steps, distilled, **kw)
            pm_s = open_loop_metrics(model, vars_, normalizer, schedule,
                                     dataset, b_idx, steps, distilled,
                                     shuffle_keys=IMAGE_KEYS, **kw)
            nfe = (1 if distilled else steps) * k * (2 if scale != 1.0 else 1)
            pm_rows.append({
                "name": name, "scale": scale, "k": k, "nfe": int(nfe),
                "sampler": pm_t["sampler"],
                "true_mse": pm_t["mse"], "shuffled_mse": pm_s["mse"],
                "ratio_shuffled_over_true":
                    pm_s["mse"] / pm_t["mse"] if pm_t["mse"] > 0
                    else float("nan"),
            })

        guided_variants = ([] if t_distilled else
                           [(s, m) for s, m in guidance_rows if "image" in m])
        for scale, mods in [(1.0, ())] + guided_variants:
            pm_row("teacher", t_vars, t_steps, t_distilled, posterior_mean_k,
                   scale, mods)
        for s_name, s_vars, s_steps, s_distilled in loaded_students:
            # single-draw AND posterior-mean: for a student distilled from
            # a posterior-mean teacher the single draw is already a mean
            # estimate, so its K=1 row is the cheapest deployable point
            pm_row(s_name, s_vars, s_steps, s_distilled, 1)
            pm_row(s_name, s_vars, s_steps, s_distilled, posterior_mean_k)
        result["posterior_mean_boundary"] = {
            "k": posterior_mean_k, "num_windows": int(len(b_idx)),
            "rows": pm_rows,
        }

    if students or solver_rows:
        logger.info("teacher noise-resampling self-consistency")
        result["teacher_self_consistency"] = self_consistency(
            model, t_vars, schedule, normalizer, t_steps,
            batch_size=min(batch_size, 64), num_chunks=chunks, seed=seed)
    return result


def main(argv=None):
    parser = argparse.ArgumentParser(description="Sampler quality report")
    parser.add_argument("--teacher", required=True)
    parser.add_argument("--student", action="append", default=[],
                        help="distilled checkpoint (repeatable)")
    parser.add_argument("--dummy-data", action="store_true")
    parser.add_argument("--db", type=str, default=None)
    parser.add_argument("--windows", type=int, default=256)
    parser.add_argument("--chunks", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="quality_report")
    parser.add_argument("--solver-row", action="append", default=[],
                        help="training-free sampler row on the teacher "
                             "params, e.g. 'dpmpp10' or 'dpmpp10@lambda' "
                             "(repeatable; diffusion/dpm_solver.py)")
    parser.add_argument("--raw-weights", action="store_true",
                        help="evaluate the raw params of EMA checkpoints "
                             "instead of the EMA tree (ablation)")
    parser.add_argument("--guidance-row", action="append", default=[],
                        help="classifier-free-guidance row on the teacher, "
                             "SCALE[@MODALITY[,MODALITY...]] — e.g. "
                             "'2.0@image' (default null modality: image); "
                             "repeatable (data/pipeline.py null_modalities)")
    parser.add_argument("--posterior-mean", type=int, default=0,
                        help="K>1: add boundary-window rows where K sampled "
                             "trajectories are AVERAGED per context before "
                             "the MSE (posterior-mean estimator — the "
                             "oracle rows' estimator class); teacher runs "
                             "unguided + each image guidance row, and every "
                             "--student gets a single-draw AND an xmeanK "
                             "row, each with its NFE/replan serving cost")
    args = parser.parse_args(argv)

    import re

    solver_rows = []
    for row in args.solver_row:
        m = re.fullmatch(r"([a-z]+)(\d+)(@[a-z]+)?", row)
        if not m:
            parser.error(f"bad --solver-row {row!r}; expected e.g. dpmpp10 "
                         f"or dpmpp10@lambda")
        solver = m.group(1) + (m.group(3) or "")
        from soccerdiffusion_tpu.diffusion import parse_solver

        try:
            parse_solver(solver)
        except ValueError as e:
            parser.error(str(e))
        solver_rows.append((solver, int(m.group(2))))

    from soccerdiffusion_tpu.data.pipeline import parse_guidance_spec

    guidance_rows = []
    for row in args.guidance_row:
        try:
            guidance_rows.append(parse_guidance_spec(row))
        except ValueError as e:
            parser.error(str(e))

    teacher_loaded = _load(args.teacher, prefer_ema=not args.raw_weights)
    config = Config.from_dict(teacher_loaded[0])
    from soccerdiffusion_tpu.training.train import build_dataset

    dataset = build_dataset(args, config)

    result = run_report(args.teacher, args.student, dataset, args.windows,
                        args.chunks, args.batch_size, args.seed,
                        teacher_loaded=teacher_loaded,
                        solver_rows=solver_rows,
                        raw_weights=args.raw_weights,
                        guidance_rows=guidance_rows,
                        posterior_mean_k=args.posterior_mean)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.with_suffix(".json").write_text(json.dumps(result, indent=2))
    out.with_suffix(".md").write_text(markdown_report(result))
    logger.info(f"wrote {out.with_suffix('.json')} and {out.with_suffix('.md')}")
    return result


if __name__ == "__main__":
    main()
