"""Cross-framework convergence equivalence: our trainer vs the torch
reference train loop.

The deepest SURVEY.md promise — mIoU parity at the published recipes —
cannot be measured directly on this box (no ADE20K/VOC/Cityscapes data,
zero egress). The strongest proxies, in increasing strength:

1. eval logit parity at recipe scale (tests/test_recipe_parity.py),
2. 10-step lockstep trajectory parity (tests/test_train_lockstep.py),
3. THIS: full-horizon convergence equivalence — train the reference's
   torch PSPNet50 with the reference's own loop semantics
   (/root/reference/tool/train.py:247-340: poly LR after step, x1/x10
   param groups, torch SGD update order, train-mode BN, Dropout2d) and
   OUR train step from the IDENTICAL converted init on the IDENTICAL
   batch sequence and recipe hyperparameters, and compare held-out
   val-mIoU trajectories after several hundred SGD steps.

Lockstep (2) pins per-step numerics but only over 10 steps; this run
shows the two frameworks' training dynamics reach the same quality at a
horizon where f32 reduction-order noise and independent Dropout2d
streams have fully decorrelated the trajectories — i.e. the *recipes*
are equivalent, not just the first steps.

Because the trajectories ARE decorrelated at this horizon, a single
seed's final-point gap is dominated by seed noise (each arm's own
trajectory fluctuates >1 point between adjacent evals), so the per-seed
line uses a one-sided criterion — ours must not be WORSE than the
reference by ≥1 point (being better is not a parity failure) — and the
real evidence is the multi-seed band: run several seeds (identical
converted init and batch sequence per seed in both arms) and compare
the two final-mIoU distributions (`summarize_band`).

The torch arm runs FIRST and to completion before any JAX compute (this
box corrupts in-flight XLA:CPU buffers when torch OMP work overlaps —
see CLAUDE.md); the JAX arm then runs on whatever platform is default
(the real TPU under axon).

Usage:
    python tool/convergence_cross.py [STEPS] [--seed K] [--arch psp|psa]
        — one seed (psa uses the differentiable psamask oracle on the
          torch side, pinned to the C++ reference semantics)
    python tool/convergence_cross.py --band [--arch psp|psa]
        — summarize all recorded seeds of that arch
Per-seed runs append their summary line to CONVERGENCE_r03.jsonl
directly (long runs must persist promptly on this box); --band reads
those lines back and appends the multi-seed band summary.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tool.convergence import (
    AUX_W,
    BASE_LR,
    BATCH,
    CLASSES,
    CROP,
    EVAL_EVERY,
    MOMENTUM,
    WD,
    make_dataset,
    run,
)

REFERENCE = "/root/reference"

VALUE_SCALE = 255
MEAN = np.array([0.485, 0.456, 0.406], np.float32) * VALUE_SCALE
STD = np.array([0.229, 0.224, 0.225], np.float32) * VALUE_SCALE

# The torch arm costs ~17-27 s/step on this 1-core host (300 steps ≈
# 1.5-2.5 h), long enough to straddle a session boundary. It therefore
# checkpoints itself at every eval point into an UNTRACKED stash
# (gitignored; /tmp does not survive sessions, the repo dir does) and
# resumes bit-exactly: model + optimizer + numpy index-stream + torch
# RNG state are all restored, so a resumed trajectory is identical to an
# unbroken one (CPU torch ops are deterministic). The stash is deleted
# once the seed's record line is written.
STASH_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".conv_stash")


def _stash_path(arch: str, seed: int, steps: int, replica: int = 0) -> str:
    rep = f"_r{replica}" if replica else ""
    return os.path.join(STASH_DIR, f"torch_{arch}_seed{seed}_{steps}{rep}.pt")


def run_torch(steps: int, train_set, val_set, seed: int = 0,
              arch: str = "psp", replica: int = 0, build_only: bool = False):
    """Reference-recipe torch training (single process == one replica;
    DDP loss semantics reduce to the plain valid-pixel mean). Returns
    (trajectory, init_state_dict). ``arch`` 'psa' uses the reference
    PSANet with the differentiable psamask oracle (the op is linear with
    a fixed 0/1 scatter pattern — tests/test_train_lockstep.py, itself
    pinned to the C++ semantics of psamask.cpp:11-61).

    ``replica`` > 0 keeps the model init IDENTICAL (same manual_seed at
    construction) but shifts the stochastic streams — torch RNG (Dropout2d
    draws) and the numpy batch-index stream — so repeated runs of the
    same (arch, seed) measure the within-arm seed noise sigma that the
    round-5 pre-registered criterion consumes.

    ``build_only`` constructs the model and returns ``(None, init_sd)``
    without training — the JAX arm of a pair only needs the converted
    init (construction under ``manual_seed(seed)`` is deterministic on
    CPU), which lets the two arms of a pair run in separate processes:
    torch on the single CPU core, ours on the TPU, concurrently."""
    import torch
    import torch.nn as nn

    from semseg_tpu.utils.metrics import intersection_and_union, summarize

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    torch.manual_seed(seed)
    criterion = nn.CrossEntropyLoss(ignore_index=255)
    if arch == "psa":
        from tests.test_train_lockstep import (
            _install_differentiable_psa_stub,
        )

        _install_differentiable_psa_stub()
        from model.psanet import PSANet as TorchPSANet

        # mask dims as the train driver derives them for crop 97/shrink 2
        # (reference tool/train.py:70-72) — must match the JAX arm
        # (tool/convergence.py).
        mask = 2 * ((CROP - 1) // (8 * 2) + 1) - 1
        model = TorchPSANet(
            layers=50, classes=CLASSES, zoom_factor=8, pretrained=False,
            psa_type=2, compact=False, shrink_factor=2,
            mask_h=mask, mask_w=mask, normalization_factor=1.0,
            psa_softmax=True, criterion=criterion,
        )
        modules_new = [model.psa, model.cls, model.aux]
    else:
        from model.pspnet import PSPNet as TorchPSPNet

        model = TorchPSPNet(
            layers=50, classes=CLASSES, zoom_factor=8, pretrained=False,
            criterion=criterion,
        )
        modules_new = [model.ppm, model.cls, model.aux]
    init_sd = {k: v.detach().clone() for k, v in model.state_dict().items()}
    if build_only:
        return None, init_sd
    if replica:
        # init is captured; decorrelate only the training-time draws
        torch.manual_seed(seed + 7919 * replica)

    # Reference optimizer groups (tool/train.py:125-140): backbone at
    # base_lr, new modules (ppm|psa, cls, aux) at 10x.
    modules_ori = [model.layer0, model.layer1, model.layer2, model.layer3,
                   model.layer4]
    params_list = [dict(params=m.parameters(), lr=BASE_LR)
                   for m in modules_ori]
    params_list += [dict(params=m.parameters(), lr=BASE_LR * 10)
                    for m in modules_new]
    opt = torch.optim.SGD(params_list, lr=BASE_LR, momentum=MOMENTUM,
                          weight_decay=WD)

    tr_images, tr_labels = train_set
    va_images, va_labels = val_set

    def normalize_nchw(images):
        x = (images - MEAN) / STD
        return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

    def val_miou():
        model.eval()
        inter_sum = None
        with torch.no_grad():
            for s in range(0, len(va_images), BATCH):
                logits = model(normalize_nchw(va_images[s:s + BATCH]))
                pred = logits.argmax(1).numpy()
                inter, union, target = intersection_and_union(
                    pred, va_labels[s:s + BATCH].astype(np.int64), CLASSES, 255
                )
                if inter_sum is None:
                    inter_sum, union_sum, target_sum = inter, union, target
                else:
                    inter_sum = inter_sum + inter
                    union_sum = union_sum + union
                    target_sum = target_sum + target
        model.train()
        m_iou, _, _ = summarize(inter_sum, union_sum, target_sum)
        return float(m_iou)

    model.train()
    # same index stream as the JAX arm (replica offset shifts both arms)
    rs = np.random.RandomState(seed + 1 + 7919 * replica)
    trajectory = []
    start_step = 0
    stash = _stash_path(arch, seed, steps, replica)
    if os.path.exists(stash):
        # weights_only=False: the stash holds numpy RandomState tuples,
        # which torch 2.13's weights_only=True default rejects. It is
        # self-generated by this script and gitignored — not untrusted
        # input — so the weights_only trust concern does not apply.
        snap = torch.load(stash, map_location="cpu", weights_only=False)
        model.load_state_dict(snap["model"])
        opt.load_state_dict(snap["opt"])
        rs.set_state(snap["np_rng"])
        torch.set_rng_state(snap["torch_rng"])
        trajectory = [tuple(p) for p in snap["trajectory"]]
        start_step = snap["step"]
        print(json.dumps({"framework": "torch_reference", "arch": arch,
                          "resumed_from_step": start_step}), flush=True)

    def _save_stash(step_done):
        os.makedirs(STASH_DIR, exist_ok=True)
        tmp = stash + ".tmp"
        torch.save({
            "step": step_done,
            "model": model.state_dict(),
            "opt": opt.state_dict(),
            "np_rng": rs.get_state(),
            "torch_rng": torch.get_rng_state(),
            "trajectory": trajectory,
        }, tmp)
        os.replace(tmp, stash)

    t0 = time.time()
    for step in range(start_step, steps):
        idx = rs.randint(0, len(tr_images), BATCH)
        x = normalize_nchw(tr_images[idx])
        y = torch.from_numpy(tr_labels[idx].astype(np.int64))
        _, main_loss, aux_loss = model(x, y)
        loss = main_loss + AUX_W * aux_loss
        opt.zero_grad()
        loss.backward()
        opt.step()
        # Reference poly-LR timing (tool/train.py:299-304): the LR for the
        # NEXT iteration is installed after stepping.
        next_lr = BASE_LR * (1 - float(step + 1) / steps) ** 0.9
        for gi in range(len(modules_ori)):
            opt.param_groups[gi]["lr"] = next_lr
        for gi in range(len(modules_ori), len(params_list)):
            opt.param_groups[gi]["lr"] = next_lr * 10
        if (step + 1) % EVAL_EVERY == 0 or step + 1 == steps:
            miou = val_miou()
            trajectory.append((step + 1, miou))
            print(json.dumps({
                "framework": "torch_reference", "arch": arch, "step": step + 1,
                "val_mIoU": round(miou, 4),
                "loss": round(float(loss.detach()), 4),
                "elapsed_s": round(time.time() - t0, 1),
            }), flush=True)
            _save_stash(step + 1)
    return trajectory, init_sd


# Round-5 record. Seeded at round start with (a) the round-5
# pre-registered criterion — per-seed adjudication by a MEASURED
# within-arm sigma instead of the asserted one — and (b) the per-seed
# lines carried from CONVERGENCE_r04.jsonl, so the file is the complete
# evidence set the adjudication runs over.
RECORD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "CONVERGENCE_r05.jsonl")


def _read_record():
    recs = []
    if os.path.exists(RECORD):
        with open(RECORD) as f:
            for line in f:
                recs.append(json.loads(line))
    return recs


def _append_record(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(RECORD, "a") as f:
        f.write(line + "\n")


def merge_halves():
    """Join torch/ours half lines into canonical per-pair lines.

    Replica 0 pairs become ``cross_framework_val_mIoU_gap`` lines (the
    band summarizer consumes those); replica > 0 pairs become
    ``within_arm_replica`` lines (the sigma step consumes those, the
    band ignores them). ``pass`` on merged lines is the round-4 1pt
    preliminary rule; the round-5 governing verdict is the
    ``adjudication_r05`` line written by --sigma."""
    recs = _read_record()
    halves = {}
    for r in recs:
        if r.get("metric") == "cross_framework_half":
            key = (r["arch"], r["seed"], r.get("replica", 0), r["steps"])
            halves.setdefault(key, {})[r["framework"]] = r
    merged_keys = {
        (r["arch"], r.get("seed", 0), r.get("replica", 0), r["steps"])
        for r in recs
        if r.get("metric") in ("cross_framework_val_mIoU_gap",
                               "within_arm_replica")
    }
    for key in sorted(halves):
        if key in merged_keys or len(halves[key]) != 2:
            continue
        arch, seed, replica, steps = key
        t = halves[key]["torch_reference"]
        o = halves[key]["ours_f32"]
        ref_final, ours_final = t["final"], o["final"]
        _append_record({
            "metric": ("within_arm_replica" if replica
                       else "cross_framework_val_mIoU_gap"),
            "arch": arch, "seed": seed, "replica": replica, "steps": steps,
            "torch_reference_final": round(ref_final, 4),
            "ours_f32_final": round(ours_final, 4),
            "gap_points": round((ref_final - ours_final) * 100, 2),
            "pass": ours_final >= ref_final - 0.01,
            "torch_trajectory": t["trajectory"],
            "ours_trajectory": o["trajectory"],
        })


def adjudicate_sigma(arch_sigma: str = "psp", seed_sigma: int = 4,
                     judge_archs=("psp", "psa")):
    """Round-5 governing verdict: measure the within-arm noise of the
    (arch_sigma, seed_sigma) arm from its replica set — the ORIGINAL
    run plus every within_arm_replica line — and re-judge EVERY per-seed
    pair (``judge_archs``, carried and new) under the pre-registered rule
      fail iff torch_final - ours_final > max(0.01, 2 * sigma_gap)
    where sigma_gap is the std of the per-replica (torch - ours) gap:
    the two arms of a replica share one batch-index stream, so the gap
    std directly measures the noise of the quantity being judged.

    The first r05 adjudication used the PSP seed-4 set for BOTH archs
    (the only measured sigma at the time). A later PSA-own replica set
    (seed 5, the worst PSA gap) re-judges the PSA seeds against the
    noise of the arch actually being judged — strictly more evidence,
    zero post-hoc edits to the earlier lines."""
    recs = _read_record()
    reps = [r for r in recs
            if r.get("metric") in ("cross_framework_val_mIoU_gap",
                                   "within_arm_replica")
            and r["arch"] == arch_sigma and r.get("seed") == seed_sigma]
    # one sigma estimate = one horizon: replicas from a different steps
    # count are a different experiment (and the judged pairs below ARE
    # horizon-filtered), so pooling them would silently inflate sigma
    horizon = max(r["steps"] for r in reps) if reps else 0
    reps = [r for r in reps if r["steps"] == horizon]
    if len(reps) < 3:
        # std(ddof=1) of <2 points is NaN and max(0.01, 2*nan) silently
        # collapses to the bare 1pt rule while the recorded rule string
        # would still claim a measured sigma — refuse instead
        raise SystemExit(
            f"--sigma needs >=3 recorded ({arch_sigma}, seed {seed_sigma}) "
            f"replicas at one horizon; found {len(reps)}")
    torch_f = np.array([r["torch_reference_final"] for r in reps])
    ours_f = np.array([r["ours_f32_final"] for r in reps])
    gaps = torch_f - ours_f
    sigma_torch = float(torch_f.std(ddof=1))
    sigma_ours = float(ours_f.std(ddof=1))
    sigma_gap = float(gaps.std(ddof=1))
    _append_record({
        "metric": "within_arm_sigma",
        "arch": arch_sigma, "seed": seed_sigma, "n_replicas": len(reps),
        "replicas": sorted(r.get("replica", 0) for r in reps),
        "torch_finals": [round(v, 4) for v in torch_f.tolist()],
        "ours_finals": [round(v, 4) for v in ours_f.tolist()],
        "gaps_points": [round(v * 100, 2) for v in gaps.tolist()],
        "sigma_torch_points": round(sigma_torch * 100, 2),
        "sigma_ours_points": round(sigma_ours * 100, 2),
        "sigma_gap_points": round(sigma_gap * 100, 2),
    })
    threshold = max(0.01, 2 * sigma_gap)
    for arch in judge_archs:
        pairs = [r for r in recs
                 if r.get("metric") == "cross_framework_val_mIoU_gap"
                 and r.get("arch", "psp") == arch]
        horizon = max(r["steps"] for r in pairs)
        pairs = [r for r in pairs if r["steps"] == horizon]
        verdicts = []
        for r in sorted(pairs, key=lambda r: r.get("seed", 0)):
            gap = r["torch_reference_final"] - r["ours_f32_final"]
            verdicts.append({
                "seed": r.get("seed", 0),
                "gap_points": round(gap * 100, 2),
                "pass": gap <= threshold,
            })
        _append_record({
            "metric": "adjudication_r05",
            "arch": arch, "steps": horizon,
            "rule": "fail iff torch_final - ours_final > "
                    "max(0.01, 2*sigma_gap), sigma_gap measured from the "
                    f"{arch_sigma} seed-{seed_sigma} replica set",
            "threshold_points": round(threshold * 100, 2),
            "per_seed": verdicts,
            "n_pass": sum(v["pass"] for v in verdicts),
            "n_fail": sum(not v["pass"] for v in verdicts),
        })


def summarize_band(arch: str = "psp"):
    """Read all per-seed cross-framework summary lines from the record
    and append the multi-seed band comparison. Pass: our final-mIoU band
    is not worse than the reference's — mean(ours) >= mean(torch) - 1pt
    AND the two seed ranges overlap or ours lies entirely above."""
    recs = []
    with open(RECORD) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("metric") == "cross_framework_val_mIoU_gap" \
                    and rec.get("arch", "psp") == arch:
                recs.append(rec)
    # only compare seeds run to the same (longest recorded) horizon —
    # short smoke runs must not dilute the band
    horizon = max(r["steps"] for r in recs)
    recs = [r for r in recs if r["steps"] == horizon]
    torch_finals = [r["torch_reference_final"] for r in recs]
    ours_finals = [r["ours_f32_final"] for r in recs]
    seeds = [r.get("seed", 0) for r in recs]
    t, o = np.array(torch_finals), np.array(ours_finals)
    overlap_or_above = (o.min() <= t.max() and t.min() <= o.max()) \
        or o.min() >= t.max()
    summary = {
        "metric": "cross_framework_band",
        "arch": arch,
        "steps": horizon,
        "seeds": seeds,
        "torch_finals": [round(v, 4) for v in torch_finals],
        "ours_finals": [round(v, 4) for v in ours_finals],
        "torch_mean": round(float(t.mean()), 4),
        "ours_mean": round(float(o.mean()), 4),
        "mean_gap_points": round(float(t.mean() - o.mean()) * 100, 2),
        "torch_seed_spread_points": round(float(t.max() - t.min()) * 100, 2),
        "ours_seed_spread_points": round(float(o.max() - o.min()) * 100, 2),
        "pass": bool(o.mean() >= t.mean() - 0.01 and overlap_or_above),
    }
    line = json.dumps(summary)
    print(line)
    with open(RECORD, "a") as f:
        f.write(line + "\n")


def seed_stats():
    """SUPPLEMENTARY (does not replace the registered adjudication):
    decompose the per-seed gap variance into its two sources —
    within-seed stream noise (replica sets: same init, shifted
    dropout/batch streams) vs across-seed init-level variation — and
    report the across-seed mean gap with its standard error. This is
    the measured answer to 'is a -2.49pt seed a tail-regime divergence
    or noise': if |across-seed mean| is small relative to the
    across-seed sigma and replica-mean gaps occur in BOTH directions at
    similar magnitude, per-seed excursions are init-level noise."""
    recs = _read_record()
    out = {"metric": "seed_level_decomposition"}
    for arch in ("psp", "psa"):
        pairs = [r for r in recs
                 if r.get("metric") == "cross_framework_val_mIoU_gap"
                 and r.get("arch", "psp") == arch]
        if not pairs:
            continue
        horizon = max(r["steps"] for r in pairs)
        pairs = [r for r in pairs if r["steps"] == horizon]
        gaps = np.array(sorted(
            (r.get("seed", 0),
             r["torch_reference_final"] - r["ours_f32_final"])
            for r in pairs
        ))
        across = {
            "seeds": [int(s) for s in gaps[:, 0]],
            "gaps_points": [round(g * 100, 2) for g in gaps[:, 1]],
            "mean_gap_points": round(float(gaps[:, 1].mean()) * 100, 2),
            "across_seed_sigma_points": round(
                float(gaps[:, 1].std(ddof=1)) * 100, 2),
            "sem_points": round(
                float(gaps[:, 1].std(ddof=1) / np.sqrt(len(gaps))) * 100, 2),
        }
        # replica sets: within-seed stream sigma + per-seed replica-mean
        reps = {}
        for r in recs:
            if r.get("metric") in ("cross_framework_val_mIoU_gap",
                                   "within_arm_replica") \
                    and r.get("arch", "psp") == arch:
                reps.setdefault(r.get("seed", 0), []).append(
                    r["torch_reference_final"] - r["ours_f32_final"])
        rep_sets = {s: v for s, v in reps.items() if len(v) >= 3}
        across["replica_sets"] = {
            str(s): {
                "n": len(v),
                "mean_gap_points": round(float(np.mean(v)) * 100, 2),
                "stream_sigma_points": round(
                    float(np.std(v, ddof=1)) * 100, 2),
            }
            for s, v in sorted(rep_sets.items())
        }
        out[arch] = across
    _append_record(out)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("steps", nargs="?", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arch", choices=("psp", "psa"), default="psp")
    ap.add_argument("--replica", type=int, default=0,
                    help="within-arm replica index (0 = the original run)")
    ap.add_argument("--only", choices=("both", "torch", "ours"),
                    default="both",
                    help="run one half of the pair; halves pair up by "
                         "(arch, seed, replica, steps) via --merge")
    ap.add_argument("--band", action="store_true")
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("--sigma", action="store_true")
    ap.add_argument("--sigma-seed", type=int, default=None,
                    help="with --sigma: use the (--arch, this seed) "
                         "replica set and re-judge only that arch "
                         "(default: the psp seed-4 set, both archs)")
    ap.add_argument("--seedstats", action="store_true")
    ns = ap.parse_args()
    arch, steps, seed, replica = ns.arch, ns.steps, ns.seed, ns.replica
    if ns.band:
        summarize_band(arch)
        return
    if ns.merge:
        merge_halves()
        return
    if ns.sigma:
        if ns.sigma_seed is not None:
            adjudicate_sigma(arch, ns.sigma_seed, judge_archs=(arch,))
        else:
            adjudicate_sigma()
        return
    if ns.seedstats:
        seed_stats()
        return
    train_set = make_dataset(0, 256)
    val_set = make_dataset(1, 64)

    torch_traj = ours_traj = None
    if ns.only in ("both", "torch"):
        # Torch arm to completion before any JAX compute (same-process
        # overlap corrupts XLA:CPU buffers — CLAUDE.md; separate
        # processes are safe, which is what --only exploits).
        torch_traj, init_sd = run_torch(steps, train_set, val_set,
                                        seed=seed, arch=arch,
                                        replica=replica)
    else:
        # ours-only: the init is the torch construction under
        # manual_seed(seed) — deterministic, no training needed.
        _, init_sd = run_torch(steps, train_set, val_set, seed=seed,
                               arch=arch, build_only=True)

    if ns.only in ("both", "ours"):
        from semseg_tpu.models.convert import convert_torch_state_dict

        variables, unused = convert_torch_state_dict(init_sd, arch, 50)
        assert not unused, unused

        os.environ["CONVERGENCE_ARCH"] = arch  # run() builds the same arch
        ours_traj = run("float32", steps, train_set, val_set, seed=seed,
                        init_variables=variables,
                        stream_offset=7919 * replica)

    if ns.only == "both":
        ref_final = torch_traj[-1][1]
        ours_final = ours_traj[-1][1]
        _append_record({
            "metric": ("within_arm_replica" if replica
                       else "cross_framework_val_mIoU_gap"),
            "arch": arch, "seed": seed, "replica": replica, "steps": steps,
            "torch_reference_final": round(ref_final, 4),
            "ours_f32_final": round(ours_final, 4),
            "gap_points": round((ref_final - ours_final) * 100, 2),
            # one-sided at a decorrelated horizon: fail only if OURS is
            # worse (preliminary 1pt rule; adjudication_r05 governs)
            "pass": ours_final >= ref_final - 0.01,
            "torch_trajectory": [[s, round(m, 4)] for s, m in torch_traj],
            "ours_trajectory": [[s, round(m, 4)] for s, m in ours_traj],
        })
    else:
        traj = torch_traj if ns.only == "torch" else ours_traj
        _append_record({
            "metric": "cross_framework_half",
            "framework": ("torch_reference" if ns.only == "torch"
                          else "ours_f32"),
            "arch": arch, "seed": seed, "replica": replica, "steps": steps,
            "final": round(traj[-1][1], 4),
            "trajectory": [[s, round(m, 4)] for s, m in traj],
        })
    if ns.only in ("both", "torch"):
        stash = _stash_path(arch, seed, steps, replica)
        if os.path.exists(stash):
            os.remove(stash)  # the record is written; the stash is spent


if __name__ == "__main__":
    main()
