"""Multi-HOST dryrun: 2 localhost processes x 4 virtual CPU devices.

VERDICT r4 missing #5 / SURVEY §2.3: the single-process dryrun
(`__graft_entry__.dryrun_multichip`) validates the 8-device mesh
sharding; this script validates the *multi-process* path — each worker
joins a ``jax.distributed`` job (the DCN analogue), builds the GLOBAL
8-device mesh, assembles its process-local batch shard into a global
array, and runs:

  * one jitted train step over the global mesh (gradient all-reduce
    spans both processes), and
  * the batched encode device-forward (analysis -> z symbols) sharded
    frame-per-device over the same mesh, with each process reading back
    its addressable shards (the host rANS stage is per-frame
    process-local and covered by tests/test_batch_codec.py).

Run: python scripts/dryrun_multihost.py       (spawns the 2 workers)
Output: MULTIHOST_r05.json at the repo root.
"""

import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
N_PROC = 2
LOCAL_DEVICES = 4


def worker(pid: int, port: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["LCPCGA_NO_COMPILE_CACHE"] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", None)
    sys.path.insert(0, REPO)

    from lcpcga_tpu.parallel import distributed_init

    distributed_init(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=N_PROC, process_id=pid)
    assert jax.process_count() == N_PROC, jax.process_count()
    n_global = jax.device_count()
    n_local = len(jax.local_devices())
    assert n_global == N_PROC * LOCAL_DEVICES, n_global

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lcpcga_tpu import ops
    from lcpcga_tpu.data import QMap, batch_from_clouds, surface_cloud
    from lcpcga_tpu.models import Capacities, ColorModel
    from lcpcga_tpu.parallel import (
        create_train_state,
        data_parallel_mesh,
        make_train_step,
    )
    from lcpcga_tpu.training import Loss

    caps = Capacities(caps=(128,) * 6, cand_factor=27, tile_fraction=0.0,
                      same_tile_fraction=0.0, analysis_tiles=False)
    model = ColorModel(caps=caps, g_a_n1=8, g_a_n2=8, g_a_n3=8,
                       g_s_n1=8, g_s_n2=8, g_s_n3=8,
                       c_bottleneck=8, c_hyper=8)

    # Global batch: one frame per GLOBAL device; this process owns the
    # frames covered by its local devices.
    clouds = [surface_cloud(80, resolution=64, seed=b) for b in range(n_global)]
    coords, feats, valid = batch_from_clouds(clouds, 128)
    lo, hi = pid * LOCAL_DEVICES, (pid + 1) * LOCAL_DEVICES

    mesh = data_parallel_mesh()
    bsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    gbatch = tuple(
        jax.make_array_from_process_local_data(bsh, np.asarray(a[lo:hi]))
        for a in (coords, feats, valid)
    )

    # Params init on process-local data (identical seeds -> identical
    # params on both processes), then placed replicated on the mesh.
    x = ops.from_coords(jnp.asarray(coords[:1]), jnp.asarray(feats[:1]),
                        jnp.asarray(valid[:1]))
    qm = QMap({"lambda_A_min": 0, "lambda_A_max": 6400,
               "lambda_G_min": 0, "lambda_G_max": 200, "mode": "quadratic"})
    q, lam = qm(x, jax.random.PRNGKey(0))
    init = jax.jit(lambda rngs, x, q, lam: model.init(rngs, x, q, lam, training=True))
    params = init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x, q, lam
    )

    loss_cfg = {
        "focal": {"type": "Multiscale_FocalLoss", "alpha": 0.5, "gamma": 2.0},
        "color": {"type": "ColorLoss", "loss": "L2"},
        "bpp-y": {"type": "BPPLoss", "key": "y", "weight": 1.0},
        "bpp-z": {"type": "BPPLoss", "key": "z", "weight": 1.0},
    }
    state, opt, aux_opt = create_train_state(model, params)
    state = jax.device_put(state, repl)
    step = make_train_step(model, Loss(loss_cfg), qm, opt, aux_opt, mesh=mesh,
                           donate=False)
    rng = jax.device_put(jax.random.PRNGKey(3), repl)
    state, metrics = step(state, *gbatch, rng)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), metrics

    # Batched encode device-forward over the global mesh: frame-per-
    # device analysis + hyper-analysis to integer z symbols.
    def encode_fwd(params, coords, feats, valid):
        x = ops.from_coords(coords, feats, valid)
        qf = jnp.where(x.valid[..., None], 0.5, 0.0)
        qq = x.with_feats(jnp.concatenate([qf, qf], axis=-1))
        y, q_lat, k, ov = model.apply(params, x, qq,
                                      method=ColorModel.analysis)
        z_sym, z_cnt, z_ov = model.apply(params, y,
                                         method=ColorModel.entropy_encode_z)
        return y.keys, y.count, z_sym, z_cnt, k

    enc = jax.jit(encode_fwd,
                  in_shardings=(repl, bsh, bsh, bsh),
                  out_shardings=bsh)
    pr = jax.device_put(params, repl)
    y_keys, y_cnt, z_sym, z_cnt, k = enc(pr, *gbatch)
    # Each process reads back its addressable frame shards (what the
    # host rANS coder would consume).
    local_frames = 0
    for shard in y_keys.addressable_shards:
        assert shard.data.shape[0] == 1
        local_frames += 1
    out = {
        "process": pid, "processes": jax.process_count(),
        "global_devices": n_global, "local_devices": n_local,
        "train_loss": loss, "step": int(state.step),
        "encode_local_frames": local_frames,
        "y_counts": np.asarray(y_cnt.addressable_shards[0].data).tolist(),
    }
    print("MULTIHOST " + json.dumps(out), flush=True)


def main():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={LOCAL_DEVICES}").strip()
    env["LCPCGA_NO_COMPILE_CACHE"] = "1"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO)
        for i in range(N_PROC)
    ]
    results, logs = [], []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        logs.append(out)
        for line in out.splitlines():
            if line.startswith("MULTIHOST "):
                results.append(json.loads(line[len("MULTIHOST "):]))
        if p.returncode != 0:
            print(out[-4000:])
            raise SystemExit(f"worker rc={p.returncode}")
    assert len(results) == N_PROC, (len(results), logs)
    record = {"workers": results, "rc": 0}
    with open(os.path.join(REPO, "MULTIHOST_r05.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
