"""True multi-process multihost training: 2 OS processes x 2 virtual CPU
devices each = a 4-device global mesh with gloo cross-process collectives.

The reference's only parallelism is single-process DataParallel
(tools/train.py:99-101); this framework's multi-host story is the same pjit
program over a global mesh brought up by jax.distributed (SURVEY.md §2.6).
These tests run the REAL ``tools/train.py`` CLI in two coordinated
subprocesses (--multihost --dist_coordinator ...), asserting

  * both processes complete a full XE epoch + in-train eval,
  * their per-iteration losses are IDENTICAL (identical seeded batches ->
    replicated state stays bit-identical across hosts),
  * the 2-process loss trajectory matches a single-process run of the same
    config on the same 4 total devices (DCN sharding changes nothing),
  * only process 0 writes checkpoints/metrics (no file races).
"""

import json
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: 2-process gloo training runs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN = os.path.join(REPO, "tools", "train.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(local_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count="
                          f"{local_devices}")
    # the CLI's --device cpu flips jax_platforms in-process (the
    # sitecustomize-pinned JAX_PLATFORMS=axon would otherwise grab the
    # tunnel TPU in every subprocess)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    return env


def _run_train(ckpt: str, extra: list, local_devices: int,
               timeout: int = 600):
    cmd = [sys.executable, TRAIN,
           "--cfg", os.path.join(REPO, "configs", "synthetic_smoke.yml"),
           "--id", "mh", "--checkpoint_path", ckpt,
           "--device", "cpu", "--batch_size", "8",
           "--losses_log_every", "1", "--save_checkpoint_every", "2",
           "--language_eval", "0", "--val_images_use", "2",
           "--max_epochs", "1"] + extra
    return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True,
                            env=_env(local_devices), cwd=REPO)


def _losses(stdout: str) -> list:
    return [float(m.group(1)) for m in
            re.finditer(r"iter \d+ \(epoch \d+\) loss (-?[\d.]+)", stdout)]


def _run_pair_once(tmp_path, extra, attempt, timeout=600):
    """One 2-process bring-up.  Returns (ok, outs, returncodes)."""
    port = _free_port()
    procs, outs = [], []
    try:
        for pid in (0, 1):
            procs.append(_run_train(
                str(tmp_path / f"a{attempt}" / f"p{pid}"), [
                    "--multihost", "1",
                    "--dist_coordinator", f"localhost:{port}",
                    "--dist_num_processes", "2",
                    "--dist_process_id", str(pid),
                ] + extra, local_devices=2))
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        outs = []
    finally:
        # never leave an orphan holding the coordinator port (a dead peer
        # leaves the survivor blocked inside jax.distributed)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    if not outs:
        outs = ["<timeout: no output collected>"] * len(procs)
    rcs = [p.returncode for p in procs]
    return all(rc == 0 for rc in rcs), outs, rcs


def _run_pair(tmp_path, extra, timeout=600):
    """2-process gloo bring-up with ONE retry.  CPU gloo establishes its
    cross-process context at the first collective inside a fixed ~30 s
    XLA key-value window; under co-process load (the full one-process
    suite) the two children can skew past it even with the warm-up psum
    in tools/train.py — observed once in .full_suite_diag2.log:213 while
    the same test passes standalone.  A transient bring-up failure is
    retried once on a fresh port with a loud note; a real correctness
    failure fails both attempts."""
    attempt = 0
    ok, outs, rcs = _run_pair_once(tmp_path, extra, attempt=attempt,
                                   timeout=timeout)
    if not ok:
        sys.stderr.write(
            "\n[test_multihost] 2-process bring-up FAILED "
            f"(returncodes {rcs}); most likely the gloo ~30s KV-init "
            "window skewed under host load.  Process tails:\n"
            + "\n".join(f"--- process {i} ---\n{o[-2500:]}"
                        for i, o in enumerate(outs))
            + "\n[test_multihost] retrying once on a fresh port...\n")
        attempt = 1
        ok, outs, rcs = _run_pair_once(tmp_path, extra, attempt=attempt,
                                       timeout=timeout)
    for pid, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, (
            f"process {pid} failed on both attempts (rc={rc}).\n"
            "If the tail below shows a distributed-init or barrier "
            "timeout, the host was overloaded during BOTH bring-up "
            "windows; rerun standalone to distinguish load from a real "
            f"regression.\n{out[-4000:]}")
    ckdirs = [str(tmp_path / f"a{attempt}" / f"p{pid}") for pid in (0, 1)]
    return outs, ckdirs


def test_two_process_multihost_matches_single_process(tmp_path):
    outs, (ck0, ck1) = _run_pair(tmp_path, [])
    assert "data-parallel mesh over 4 devices" in outs[0]

    l0, l1 = _losses(outs[0]), _losses(outs[1])
    assert len(l0) >= 2, outs[0][-2000:]
    # replicated state: both hosts see bit-identical losses every step
    np.testing.assert_array_equal(l0, l1)

    # write gating: process 0 owns the artifacts, process 1 wrote nothing
    assert os.path.exists(os.path.join(ck0, "model.ckpt"))
    assert os.path.exists(os.path.join(ck0, "metrics.jsonl"))
    assert not os.path.exists(os.path.join(ck1, "model.ckpt"))
    assert not os.path.exists(os.path.join(ck1, "metrics.jsonl"))

    # same math as one process over the same 4 total devices: the DCN
    # boundary inserts collectives, not different numerics (CPU f32 is
    # deterministic, so exact equality is expected)
    cks = str(tmp_path / "single")
    p = _run_train(cks, [], local_devices=4)
    try:
        out, _ = p.communicate(timeout=600)
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()
    assert p.returncode == 0, out[-4000:]
    ls = _losses(out)
    np.testing.assert_array_equal(l0, ls)

    # metrics.jsonl from the lead process parses and carries the losses
    # (stdout prints them %.4f-rounded, hence the tolerance)
    with open(os.path.join(ck0, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    np.testing.assert_allclose([r["loss"] for r in recs], l0, atol=5e-5)


def test_two_process_multihost_rl_stage(tmp_path):
    """Classic SCST under --multihost: the sampled ids live on the
    cross-process mesh and must be allgathered before host CIDEr scoring
    (tools/train.py samples_host); both hosts must agree on every RL loss."""
    outs, _ck = _run_pair(tmp_path, [
        "--train_mode", "AIC", "--self_critical_after", "0",
        "--train_sample_n", "2", "--save_checkpoint_every", "99",
    ])
    l0, l1 = _losses(outs[0]), _losses(outs[1])
    assert len(l0) >= 2, outs[0][-2000:]
    np.testing.assert_array_equal(l0, l1)
