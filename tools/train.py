"""Training driver — CLI-compatible with the reference:

    python tools/train.py --cfg configs/uic_sd.yml --id uic_sd

State machine parity with reference tools/train.py:29-374: seeded init,
infos/histories resume (incl. data-sampler position), per-epoch schedule
updates (LR decay :151-157, scheduled sampling :159-162, glancing anneal
:164-171, self-critical / structure / drop-worst flag flips :174-189), linear
warmup (:194-196), periodic eval with best-checkpoint selection on CIDEr
(:343-363), crash-save (:365-370).

TPU-first differences: one jit'd XE step (grad+update fused); the RL stage is
sample (jit) -> CIDEr-D on host -> re-score update (jit); batches are
sharded over a 1-D 'data' mesh when more than one device is visible.
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from boficap_tpu.config import parse_opt
from boficap_tpu.data.dataset import CaptionData
from boficap_tpu.eval.eval_utils import eval_split
from boficap_tpu.models import setup as models_setup
from boficap_tpu.rewards import init_scorer
from boficap_tpu.train import optim as optim_mod
from boficap_tpu.train import steps as steps_mod
from boficap_tpu.train.state import (TrainState, create_state, load_infos,
                                     load_histories, load_params,
                                     resume_state, save_checkpoint)


def log_metrics(path, record):
    import json
    with open(path, "a") as f:
        f.write(json.dumps({k: (float(v) if hasattr(v, "item") or
                                isinstance(v, (int, float, np.floating))
                                else v) for k, v in record.items()}) + "\n")


def train(opt):
    if opt.get("device") == "cpu":
        # must happen before jax initializes a backend
        jax.config.update("jax_platforms", "cpu")
    if opt.get("multihost"):
        # multi-host (DCN) data parallelism: every host runs this same
        # program; the coordinator address/process env comes from the
        # launcher (SLURM/OMPI/TPU-pod auto-detection), or explicitly via
        # --dist_coordinator/--dist_num_processes/--dist_process_id for
        # launcher-less bring-up (exercised by tests/test_multihost.py
        # with 2 real processes).  The mesh below then spans all hosts'
        # devices and XLA's gradient psum rides ICI within a host and
        # DCN across hosts.
        kw = {}
        if opt.get("dist_coordinator"):
            kw = dict(coordinator_address=opt.dist_coordinator,
                      num_processes=int(opt.dist_num_processes),
                      process_id=int(opt.dist_process_id))
        jax.distributed.initialize(**kw)
    # hosts beyond process 0 compute everything (identical batches ->
    # identical replicated state) but must not race process 0 on the
    # checkpoint/log/tensorboard files
    lead = jax.process_index() == 0
    # persistent compilation cache shared with the test suite: repeat CLI
    # runs of the same program shapes skip XLA compilation entirely
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    np.random.seed(opt.seed)
    # training-stream keys (dropout/glat masks): cfg.rng_impl — 'rbg' bit
    # generation measured +56% XE step throughput on v5e vs the threefry
    # default (see config/opts.py); param init below stays PRNGKey
    # (threefry) so initial weights are impl-independent.
    impl = opt.get("rng_impl", "rbg") or "rbg"
    rng = (jax.random.PRNGKey(opt.seed) if impl.startswith("threefry")
           else jax.random.key(opt.seed, impl=impl))

    # data-parallel mesh over all visible devices (superset of the
    # reference's DataParallel, tools/train.py:99-101); multi-host paths
    # call jax.distributed.initialize before entering here
    from boficap_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                           replicate_state)
    import math
    if opt.get("multihost"):
        # A gcd fallback would slice the GLOBAL device list and leave some
        # hosts with zero mesh-local devices (device_put to a non-addressable
        # sharding fails) — require exact divisibility instead.  NB each host
        # runs the same seeded sampler stream, so all hosts assemble
        # identical global batches; the mesh then shards them identically.
        if opt.batch_size % len(jax.devices()) != 0:
            raise ValueError(
                f"--multihost requires batch_size ({opt.batch_size}) "
                f"divisible by the global device count "
                f"({len(jax.devices())})")
        n_dev = len(jax.devices())
    elif opt.get("mesh_shape"):
        # explicit mesh request overrides the gcd heuristic
        ms = opt.mesh_shape
        n_dev = int(ms.get("data", 0) if isinstance(ms, dict) else ms)
        if not 1 <= n_dev <= len(jax.devices()):
            raise ValueError(
                f"mesh_shape wants {n_dev} devices, have "
                f"{len(jax.devices())}")
        if opt.batch_size % n_dev != 0:
            raise ValueError(
                f"mesh_shape {n_dev} does not divide batch_size "
                f"{opt.batch_size}")
    else:
        n_dev = math.gcd(len(jax.devices()), max(opt.batch_size, 1))
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None:
        if n_dev < len(jax.devices()):
            print(f"batch_size {opt.batch_size} not divisible by "
                  f"{len(jax.devices())} devices; using {n_dev}")
        print(f"data-parallel mesh over {n_dev} devices")
    if mesh is not None and opt.get("multihost"):
        # CPU gloo initializes its cross-process context lazily at the
        # FIRST collective, with a fixed ~30s key-value timeout inside XLA;
        # if that first collective sits behind a compile-heavy program the
        # processes can skew past the window (observed with the cold XE
        # step).  Establish the context now, with a trivial psum, while the
        # processes are still in lockstep — it is reused by every later
        # program (verified; tests/test_multihost.py).  On TPU pods this is
        # a no-op-cost sanity step.
        from boficap_tpu.parallel.mesh import replicated
        warm = jax.device_put(jnp.zeros((n_dev,), jnp.float32),
                              batch_sharding(mesh))
        jax.block_until_ready(
            jax.jit(jnp.sum, out_shardings=replicated(mesh))(warm))

    def put_batch(x):
        if mesh is None:
            return jnp.asarray(x)
        if opt.get("multihost"):
            # every host assembles the identical global batch (seeded
            # sampler contract, asserted above); slice this host's shard
            # locally — device_put would allgather-verify the whole value
            # across processes on every call for cross-process shardings
            arr = np.asarray(x)
            canon = jax.dtypes.canonicalize_dtype(arr.dtype)
            if canon != arr.dtype:     # x64 demotion jnp.asarray would do
                arr = arr.astype(canon)
            return jax.make_array_from_callback(
                arr.shape, batch_sharding(mesh), lambda idx: arr[idx])
        return jax.device_put(jnp.asarray(x), batch_sharding(mesh))

    loader = CaptionData(opt)
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length

    # infos / histories resume (train.py:62-78)
    infos = {"iter": 0, "epoch": 0, "loader_state_dict": None,
             "vocab": loader.ix_to_word, "opt": dict(opt)}
    histories = defaultdict(dict)
    if opt.get("start_from") is not None and os.path.isfile(
            os.path.join(opt.start_from, f"infos_{opt.id}.pkl")):
        infos = load_infos(opt.start_from, opt.id)
        saved = infos.get("opt", {})
        for check in ("caption_model", "rnn_size", "num_layers"):
            assert saved.get(check) == opt.get(check), \
                f"command line argument and saved model disagree on {check}"
        histories.update(load_histories(opt.start_from, opt.id))
    infos["vocab"] = loader.ix_to_word

    model = models_setup(opt, loader.vocab_size)
    steps_mod.set_self_dis(model, opt.get("self_dis", False))

    # param init from one example batch
    ex = loader.get_batch("train")
    f = steps_mod._flat(ex)
    params = model.init(
        {"params": jax.random.PRNGKey(opt.seed), "glat": rng},
        jnp.asarray(ex["att_feats"]), jnp.asarray(ex["att_masks"]),
        f["labels"], f.get("phrase_num"), f.get("phrase_length"),
        f.get("phrase_syn"), glat_p=None, deterministic=True)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"model: {model.train_mode}, params: {n_params/1e6:.1f}M")

    # encoder-only warm start from an AR checkpoint (train.py:93-94)
    if opt.get("init_from"):
        from boficap_tpu.train.state import encoder_only_init
        donor = load_params(opt.init_from, params)
        params = encoder_only_init(params, donor)
        print(f"warm-started encoder from {opt.init_from}")

    tx = optim_mod.build_optimizer(opt)
    state = create_state(params, tx)
    state = resume_state(opt, state)
    if mesh is not None:
        state = replicate_state(state, mesh)
    del params

    iteration = infos["iter"]
    epoch = infos["epoch"]
    state = TrainState(params=state.params, opt_state=state.opt_state,
                       step=iteration)
    loader.load_state_dict(infos.get("loader_state_dict"))
    best_val_score = infos.get("best_val_score") if opt.load_best_score \
        else None
    plateau = optim_mod.PlateauTracker(opt.reduce_on_plateau_factor,
                                       opt.reduce_on_plateau_patience)
    if "plateau" in infos and infos["plateau"]:
        plateau.load_state_dict(infos["plateau"])

    xe_step = steps_mod.make_xe_step(
        model, tx, label_smoothing=opt.label_smoothing,
        debug_checks=bool(opt.get("debug_checks", False)),
        grad_accum=int(opt.get("grad_accum", 1) or 1))
    rl_sample = rl_step = None
    rl_step_kind = None          # "scst" | "struc"; rebuilt on change
    warned_sc_ignored = False
    metrics_log = os.path.join(opt.checkpoint_path, "metrics.jsonl")
    os.makedirs(opt.checkpoint_path, exist_ok=True)

    # tensorboard scalars (reference train.py:81, :249-289); torch ships the
    # writer — guarded so the trainer runs without it
    tb = None
    if lead:
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb = SummaryWriter(opt.checkpoint_path)
        except Exception:
            pass

    # jax.profiler trace (the TPU equivalent of the reference's ad-hoc
    # cuda-synced timers, SURVEY.md §5): --profile_steps N captures the
    # first N train steps to <checkpoint_path>/profile
    profile_steps = int(opt.get("profile_steps", 0) or 0)
    profiling = False
    profile_stop_at = 0
    if profile_steps:
        jax.profiler.start_trace(os.path.join(opt.checkpoint_path,
                                              "profile"))
        profiling = True
        # relative to the RESUMED iteration; an absolute comparison would
        # never fire on --start_from runs and trace the whole run
        profile_stop_at = iteration + profile_steps

    epoch_done = True
    sc_flag = struc_flag = drop_worst_flag = False
    glat_p = -1.0
    ss_prob = 0.0

    try:
        while True:
            if opt.max_epochs != -1 and epoch >= opt.max_epochs:
                break
            if epoch_done:
                if not opt.noamopt and not opt.reduce_on_plateau:
                    lr = optim_mod.epoch_lr(opt, epoch)
                    optim_mod.set_lr(state.opt_state, lr)
                glat_p = optim_mod.glat_rate(opt, epoch)
                ss_prob = optim_mod.scheduled_sampling_prob(opt, epoch)
                sc_flag = (opt.self_critical_after != -1
                           and epoch >= opt.self_critical_after)
                struc_flag = (opt.structure_after != -1
                              and epoch >= opt.structure_after)
                drop_worst_flag = (opt.drop_worst_after != -1
                                   and epoch >= opt.drop_worst_after)
                if (sc_flag and not struc_flag
                        and model.train_mode not in ("AIC", "auto")):
                    # the reference implements classic SCST (sc_flag) only
                    # in its AIC branch — every phrase train_mode ignores
                    # the flag and keeps XE (loss_wrapper.py:40-82 vs :83+).
                    # Match it, but loudly instead of silently.
                    if not warned_sc_ignored:
                        print(f"WARNING: self_critical_after set but "
                              f"train_mode={model.train_mode} has no classic"
                              f" SCST path (reference implements sc_flag "
                              f"only for AIC); continuing with XE — use "
                              f"structure_after for the RL stage")
                        warned_sc_ignored = True
                    sc_flag = False
                if sc_flag or struc_flag:
                    # (re)build on the FIRST RL epoch and again if the
                    # schedule moves from classic SCST into the structure
                    # stage (self_critical_after < structure_after) — the
                    # two steps have different signatures
                    needed = "struc" if struc_flag else "scst"
                    if rl_sample is None:
                        init_scorer(opt.cached_tokens)
                        rl_sample = steps_mod.make_rl_sample(
                            model, sample_method=opt.train_sample_method,
                            temperature=opt.temperature,
                            sample_n=opt.train_sample_n)
                    if rl_step_kind != needed:
                        rl_step = (steps_mod.make_rl_step(model, tx, opt)
                                   if needed == "struc" else
                                   steps_mod.make_scst_step(model, tx, opt))
                        rl_step_kind = needed
                epoch_done = False

            if opt.use_warmup and iteration < opt.noamopt_warmup and \
                    not opt.noamopt:
                optim_mod.set_lr(
                    state.opt_state,
                    opt.learning_rate * (iteration + 1) / opt.noamopt_warmup)

            t_read = time.time()
            data = loader.get_batch("train")
            read_time = time.time() - t_read

            rng, step_key = jax.random.split(rng)
            t_step = time.time()
            if struc_flag or sc_flag:
                att = put_batch(data["att_feats"])
                am = put_batch(data["att_masks"])
                samples = rl_sample(state.params, step_key, att, am)
                samples_host = samples
                if opt.get("multihost"):
                    # the sampled ids are sharded over the cross-process
                    # mesh; np.asarray on a non-addressable array raises —
                    # allgather them to host (identical on every host) for
                    # the CIDEr scoring phase
                    from jax.experimental import multihost_utils
                    samples_host = jax.tree_util.tree_map(
                        lambda x: np.asarray(
                            multihost_utils.process_allgather(x, tiled=True)),
                        samples)
                put_scores = (put_batch if opt.get("multihost")
                              else jnp.asarray)
                scores = steps_mod.rl_host_scores(
                    samples_host, data["gts"], opt,
                    classic_scst=(sc_flag and not struc_flag))
                if sc_flag and not struc_flag:
                    state, metrics = rl_step(
                        state, step_key, att, am, samples,
                        put_scores(scores["scst_reward"]))
                else:
                    gt = None
                    if opt.get("structure_loss_weight", 1.0) < 1.0:
                        # the (1-w)*lm_loss XE term needs the gt batch
                        # (reference loss_wrapper.py:169/220-222)
                        gt = {k: put_batch(data[k]) for k in
                              ("labels", "phrase_num", "phrase_length",
                               "phrase_syn", "masks")
                              if data.get(k) is not None}
                    state, metrics = rl_step(
                        state, step_key, att, am, samples,
                        {k: put_scores(v) for k, v in scores.items()},
                        gt=gt)
            else:
                if mesh is not None:
                    data = {k: (put_batch(v) if hasattr(v, "shape") else v)
                            for k, v in data.items()}
                state, metrics = steps_mod.run_xe_step(
                    xe_step, state, data, step_key, glat_p=glat_p,
                    drop_worst=opt.drop_worst_rate if drop_worst_flag else 0.0,
                    ss_prob=ss_prob)
            jax.block_until_ready(metrics["loss"])
            step_time = time.time() - t_step

            iteration += 1
            if profiling and iteration >= profile_stop_at:
                jax.profiler.stop_trace()
                profiling = False
                print("profiler trace written")
            if data["bounds"]["wrapped"]:
                epoch += 1
                epoch_done = True

            if iteration % opt.losses_log_every == 0:
                rec = {"iter": iteration, "epoch": epoch,
                       "read_s": read_time, "step_s": step_time}
                rec.update({k: float(np.asarray(v)) for k, v in
                            metrics.items()})
                if lead:
                    log_metrics(metrics_log, rec)
                histories["loss_history"][iteration] = float(
                    np.asarray(metrics["loss"]))
                if tb is not None:
                    for k, v in metrics.items():
                        try:
                            tb.add_scalar(f"train/{k}",
                                          float(np.asarray(v)), iteration)
                        except (TypeError, ValueError):
                            pass
                print(f"iter {iteration} (epoch {epoch}) "
                      f"loss {float(np.asarray(metrics['loss'])):.4f} "
                      f"step {step_time:.3f}s read {read_time:.3f}s")

            # periodic eval + checkpoint (train.py:297-363)
            if (iteration % opt.save_checkpoint_every == 0 and
                    not opt.save_every_epoch) or \
                    (epoch_done and opt.save_every_epoch):
                eval_kwargs = {"split": "val",
                               "num_images": opt.val_images_use,
                               "language_eval": opt.language_eval,
                               "train_mode": opt.train_mode,
                               "id": opt.id, "verbose": False}
                # dual/triple inference-mode eval for the unified models
                # (reference train.py:297-339)
                if opt.train_mode in ("AIC", "auto", "NAIC", "SAIC",
                                      "NNAIC", "PB_pad"):
                    modes = [""]
                elif opt.train_mode in ("UIC_s", "UIC_u"):
                    modes = ["AIC", "SAIC", "NAIC"]
                else:
                    modes = ["SAIC", "NAIC"]
                # under multihost the params are global (multi-process)
                # arrays, but eval_split jits without the mesh; params are
                # replicated (P()), so a host fetch is local and lets every
                # process evaluate independently on its own devices
                eval_params = state.params
                if opt.get("multihost"):
                    # one host fetch + ONE re-upload: eval_split's
                    # weight-free programs take params as a jit argument,
                    # so leaving the tree as host numpy would device_put
                    # the full weights again on every per-batch call
                    eval_params = jax.device_put(jax.tree_util.tree_map(
                        lambda x: np.asarray(x), state.params))
                results = {}
                for im in modes:
                    results[im or opt.train_mode] = eval_split(
                        model, eval_params, loader, eval_kwargs,
                        inference_mode=im)
                primary = list(results.values())[-1]
                if opt.language_eval and primary["lang_stats"]:
                    current_score = primary["lang_stats"]["CIDEr"]
                else:
                    current_score = -primary["loss"]
                if opt.reduce_on_plateau:
                    scale = plateau.update(current_score)
                    optim_mod.set_lr(state.opt_state,
                                     opt.learning_rate * scale)

                for name, r in results.items():
                    print(f"val[{name}]: images/s "
                          f"{r['images_per_s']:.2f} "
                          f"lang {r['lang_stats']}")
                histories["val_result_history"][iteration] = {
                    k: (r["lang_stats"], r["images_per_s"])
                    for k, r in results.items()}
                if tb is not None:
                    for name, r in results.items():
                        tb.add_scalar(f"val/{name}/images_per_s",
                                      r["images_per_s"], iteration)
                        for mk, mv in (r["lang_stats"] or {}).items():
                            if isinstance(mv, (int, float)):
                                tb.add_scalar(f"val/{name}/{mk}", mv,
                                              iteration)

                # decide new-best BEFORE the periodic save (the reference
                # updates infos['best_val_score'] first, train.py:343-357)
                # so a kill between the two saves can't resume with a stale
                # best and later overwrite the genuine model_best
                is_best = (best_val_score is None
                           or current_score > best_val_score)
                if is_best:
                    best_val_score = current_score
                infos.update(iter=iteration, epoch=epoch,
                             loader_state_dict=loader.state_dict(),
                             best_val_score=best_val_score,
                             plateau=plateau.state_dict(),
                             opt=dict(opt))
                if lead:
                    save_checkpoint(opt, state, infos, dict(histories))
                    if opt.save_history_ckpt:
                        save_checkpoint(opt, state, infos, dict(histories),
                                        append=str(iteration))
                if is_best:
                    if lead:
                        save_checkpoint(opt, state, infos, dict(histories),
                                        append="best")
                    print(f"new best val score {best_val_score:.4f}")
                if opt.get("multihost"):
                    # realign the hosts: eval/checkpointing is process-local
                    # work (host-fetched params) that can skew processes by
                    # whole compile times; the coordination-service barrier
                    # (not a device collective) tolerates that with an
                    # explicit timeout
                    try:
                        from jax._src import distributed as _dist
                        client = _dist.global_state.client
                    except (ImportError, AttributeError):
                        client = None  # private API moved in a jax upgrade
                    if client is not None:
                        client.wait_at_barrier(
                            f"post_eval_{iteration}", 600_000)
                    else:   # public psum-based fallback (gloo ctx is warm)
                        from jax.experimental import multihost_utils
                        multihost_utils.sync_global_devices(
                            f"post_eval_{iteration}")
    except (RuntimeError, KeyboardInterrupt):
        # crash-save (train.py:365-370).  The train steps donate the state
        # buffers; an exception thrown mid-step can leave ``state`` pointing
        # at donated storage, so the save itself is best-effort.
        print("Save ckpt on exception ...")
        infos.update(iter=iteration, epoch=epoch,
                     loader_state_dict=loader.state_dict(),
                     best_val_score=best_val_score,
                     plateau=plateau.state_dict(),  # like the periodic save
                     opt=dict(opt))
        try:
            if lead:
                save_checkpoint(opt, state, infos, dict(histories))
            print("Save ckpt done.")
        except RuntimeError as e:
            print(f"crash-save failed (donated state buffers?): {e}")
        stack_trace = traceback.format_exc()
        print(stack_trace)
        raise
    finally:
        if profiling:  # crash/early-exit before profile_stop_at
            jax.profiler.stop_trace()
            profiling = False

    # final save
    infos.update(iter=iteration, epoch=epoch,
                 loader_state_dict=loader.state_dict(),
                 best_val_score=best_val_score,
                 plateau=plateau.state_dict(), opt=dict(opt))
    if lead:
        save_checkpoint(opt, state, infos, dict(histories))
    return state, infos


if __name__ == "__main__":
    opt = parse_opt()
    train(opt)
