#!/usr/bin/env python
"""Two-process jax.distributed dryrun: dp-across-hosts gradient parity.

The reference scales with accelerate's single-node DDP rendezvous
(default_config.yaml:15-17); the TPU-pod replacement is jax.distributed +
a global mesh + per-host data shards (parallel/multihost.py). This tool
PROVES that wiring on one box, no pod required:

  parent                         child 0            child 1
  ------                         -------            -------
  compute reference loss/grads   initialize(coord, 2, 0)   initialize(coord, 2, 1)
  on the full global batch  ->   2 local CPU devs   2 local CPU devs
  single process                 global dp=4 mesh spanning both processes
                                 feed rows [0:2)    feed rows [2:4)
                                 host_local_to_global -> jit grad (psum by XLA)
                                 write loss + grad norms   (replicated)
  compare child vs reference within tolerance -> JSON verdict

Usage:  python tools/multihost_dryrun.py            # parent (spawns children)
        python tools/multihost_dryrun.py --process-id K ...  # child (internal)
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS, SEQ, AUDIO_T, DIM = 4, 6, 10, 8


def _make_global_batch():
    """Deterministic batch both parent and children regenerate identically:
    text span [0, SEQ), audio span [SEQ, SEQ+AUDIO_T) — the collate layout
    (ones-init labels, -1 shift, end@e-1) built directly."""
    import numpy as np

    from kalle_tpu.data.collate import Item, collate

    rng = np.random.default_rng(7)
    items = []
    for i in range(ROWS):
        ids = rng.integers(1, 250, SEQ).astype(np.int32)
        lat = rng.normal(size=(AUDIO_T, DIM)).astype(np.float32)
        items.append(Item(input_ids=ids, audio_latents=lat,
                          audio_distribution=lat.copy()))
    batch = collate(items, pad_token_id=0)
    return {k: v for k, v in batch.items()
            if not isinstance(v, list)}


def _loss_and_grads(params, cfg, tcfg, batch_jnp):
    import functools

    import jax

    from kalle_tpu.train.step import loss_fn

    @functools.partial(jax.jit, static_argnames=("c", "t"))
    def f(p, b, c, t):
        def inner(pp):
            return loss_fn(pp, c, t, b, jax.random.key(0))

        (loss, _), grads = jax.value_and_grad(inner, has_aux=True)(p)
        return loss, grads

    return f(params, batch_jnp, cfg, tcfg)


def _grad_summary(loss, grads):
    """Stable scalars for cross-process comparison: loss + a handful of
    leaf L2 norms."""
    import jax
    import numpy as np

    leaves = jax.tree.leaves(grads)
    norms = [float(np.linalg.norm(np.asarray(l, np.float64)))
             for l in leaves[:8]]
    total = float(np.sqrt(sum(
        float(np.vdot(np.asarray(l, np.float64), np.asarray(l, np.float64)))
        for l in leaves)))
    return {"loss": float(loss), "leaf_norms": norms, "grad_norm": total}


def _model():
    from kalle_tpu.core.config import LlamaConfig, LlasaConfig, TrainConfig

    cfg = LlasaConfig(llama=LlamaConfig.tiny(vocab_size=300), latent_dim=DIM,
                      audio_proj_dim=64, head_variant="sigma")
    tcfg = TrainConfig(lr=1e-3, warmup_steps=1, total_steps=2)
    return cfg, tcfg


def run_child(coordinator: str, num_processes: int, process_id: int,
              out_path: str, local_devices: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator, num_processes, process_id)
    import jax.numpy as jnp

    from kalle_tpu.models.lm import llasa
    from kalle_tpu.parallel import multihost
    from kalle_tpu.parallel.mesh import make_mesh

    assert jax.process_count() == num_processes
    ndev = len(jax.devices())
    mesh = make_mesh(dp=ndev)

    cfg, tcfg = _model()
    params = llasa.init_params(cfg, jax.random.key(3))
    full = _make_global_batch()
    # host-local shard: this host's contiguous rows of the global batch
    per = ROWS // num_processes
    local = {k: v[process_id * per:(process_id + 1) * per]
             for k, v in full.items()}
    gbatch = multihost.host_local_to_global(local, mesh)

    with jax.sharding.set_mesh(mesh):
        loss, grads = _loss_and_grads(params, cfg, tcfg, gbatch)
        summary = _grad_summary(loss, jax.device_get(grads))
    summary["process_id"] = process_id
    summary["process_count"] = jax.process_count()
    summary["global_devices"] = ndev
    multihost.barrier("dryrun-done")
    with open(out_path, "w") as f:
        json.dump(summary, f)


def run_parent(num_processes: int = 2, local_devices: int = 2,
               timeout_s: float = 600.0) -> dict:
    import numpy as np

    # reference: single process, no sharding, full batch
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kalle_tpu.models.lm import llasa

    cfg, tcfg = _model()
    params = llasa.init_params(cfg, jax.random.key(3))
    batch = {k: jnp.asarray(v) for k, v in _make_global_batch().items()}
    ref = _grad_summary(*(lambda lg: (lg[0], jax.device_get(lg[1])))(
        _loss_and_grads(params, cfg, tcfg, batch)))

    # free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    tmpdir = tempfile.mkdtemp(prefix="multihost_dryrun_")
    outs = [os.path.join(tmpdir, f"p{i}.json") for i in range(num_processes)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--coordinator", coord, "--num-processes", str(num_processes),
             "--process-id", str(i), "--out", outs[i],
             "--local-devices", str(local_devices)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(num_processes)
    ]
    deadline = time.time() + timeout_s
    for p in procs:
        try:
            p.wait(timeout=max(deadline - time.time(), 1.0))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError("multihost dryrun child timed out")
    errs = [p.stderr.read().decode() for p in procs]
    for i, p in enumerate(procs):
        if p.returncode != 0:
            raise RuntimeError(
                f"child {i} rc={p.returncode}\n{errs[i][-2000:]}")

    children = [json.load(open(o)) for o in outs]
    ok = True
    checks = []
    for ch in children:
        dl = abs(ch["loss"] - ref["loss"]) / (abs(ref["loss"]) + 1e-9)
        dg = abs(ch["grad_norm"] - ref["grad_norm"]) / \
            (ref["grad_norm"] + 1e-9)
        leaf_ok = all(
            abs(a - b) / (abs(b) + 1e-9) < 2e-4
            for a, b in zip(ch["leaf_norms"], ref["leaf_norms"]))
        checks.append({"process_id": ch["process_id"],
                       "global_devices": ch["global_devices"],
                       "rel_dloss": dl, "rel_dgrad_norm": dg,
                       "leaf_norms_ok": leaf_ok})
        ok &= dl < 2e-4 and dg < 2e-4 and leaf_ok \
            and ch["process_count"] == num_processes \
            and ch["global_devices"] == num_processes * local_devices
    verdict = {"ok": bool(ok), "reference": ref, "children": checks,
               "num_processes": num_processes,
               "local_devices_per_process": local_devices}
    print(json.dumps(verdict))
    return verdict


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=-1)
    ap.add_argument("--out", default="")
    ap.add_argument("--local-devices", type=int, default=2)
    args = ap.parse_args(argv)
    if args.process_id >= 0:
        run_child(args.coordinator, args.num_processes, args.process_id,
                  args.out, args.local_devices)
        return 0
    verdict = run_parent(args.num_processes, args.local_devices)
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
