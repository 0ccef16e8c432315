#!/usr/bin/env python
"""Per-stage breakdown of the 512x1024x10 long-horizon inference clip
(481 ms/clip slope, STATUS round 3) — where does the time go at high res?

Slope protocol per stage (vary inputs per fused iteration, fetch values).

  python tools/bench_parts_lh.py [--h 512 --w 1024 --tpred 10 --s2d]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_SMALL, K_BIG, REPEATS = 1, 3, 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--tpred", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--no-s2d", action="store_true")
    args = ap.parse_args()

    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from c2m_tpu.config import Config
    from c2m_tpu.data.synthetic import make_batch
    from c2m_tpu.models.c2m import C2MGenerator
    from c2m_tpu.ops.raster import generate_sparse_motion

    cfg = Config()
    cfg.dataset_params.dataset = "synthetic"
    cfg.dataset_params.max_objects = 24
    cfg.train_params.input_size = [args.h, args.w]
    cfg.train_params.num_predicted_frames = args.tpred
    cfg.train_params.batch_size = args.batch
    cfg.train_params.dtype = "bfloat16"
    cfg.train_params.remat = True
    cfg.train_params.scan_frames = 2
    cfg.train_params.s2d_tail = not args.no_s2d
    cfg.test_params.input_size = [args.h, args.w]
    cfg.test_params.num_predicted_frames = args.tpred
    cfg.validate()

    model = C2MGenerator(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=0).items()}
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "sample": k}, batch, train=False))(key)
    b = args.batch
    tp = cfg.train_params
    click = jax.nn.one_hot(jnp.zeros((b,), jnp.int32),
                           cfg.dataset_params.max_objects)
    print(f"device: {jax.devices()[0]} {b}x{args.h}x{args.w} tpred="
          f"{args.tpred} s2d={tp.s2d_tail}", flush=True)

    def jitter(bt, s):
        out = dict(bt)
        out["video"] = bt["video"] + jax.random.uniform(
            s, (), dtype=bt["video"].dtype, maxval=1e-3)
        out["targets_theta"] = bt["targets_theta"].at[..., 2].add(
            jax.random.uniform(s, (), maxval=1e-4))
        return out

    def slope(make_fused, *fargs):
        fs, fb = make_fused(K_SMALL), make_fused(K_BIG)

        def timed(fn, seed):
            t0 = time.perf_counter()
            float(fn(jax.random.PRNGKey(seed), *fargs))
            return time.perf_counter() - t0

        timed(fs, 0)
        timed(fb, 0)
        ts = min(timed(fs, 1 + r) for r in range(REPEATS))
        tb = min(timed(fb, 100 + r) for r in range(REPEATS))
        return (tb - ts) / (K_BIG - K_SMALL) * 1e3

    # --- full inference (use_gt_eval=True like the lh bench) --------------
    def full_factory(k):
        @jax.jit
        def fused(seed, v, bt):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                z = jax.random.normal(s, (b, 1024))
                out = model.apply(v, jitter(bt, s), z, click, True,
                                  method="inference", rngs={"sample": seed})
                acc = acc + out["generated"].astype(jnp.float32).mean()
            return acc
        return fused

    print(f"full inference: {slope(full_factory, variables, batch):8.1f} ms",
          flush=True)

    # --- appearance --------------------------------------------------------
    def app_factory(k):
        @jax.jit
        def fused(seed, v, bt):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                out = model.apply(v, jitter(bt, s), False,
                                  method=lambda m, b_, tr: m._appearance(b_, tr))
                acc = acc + out["app_encoded"].astype(jnp.float32).mean()
            return acc
        return fused

    print(f"appearance:     {slope(app_factory, variables, batch):8.1f} ms",
          flush=True)

    # --- raster (generate_sparse_motion, axis-aligned) ---------------------
    inst = batch["instance_mask"][:, tp.num_input_frames - 1]
    thetas0 = batch["targets_theta"].astype(jnp.float32)

    def raster_factory(k):
        @jax.jit
        def fused(seed, ins, ids, mask, th):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                th_i = th.at[..., 2].add(jax.random.uniform(s, (), maxval=1e-4))
                out = generate_sparse_motion(ins, ids, mask, th_i,
                                             compute_fw=True,
                                             axis_aligned=True)
                acc = acc + out["sparse_motion_bw"].astype(jnp.float32).mean()
            return acc
        return fused

    print(f"raster:         {slope(raster_factory, inst, batch['inst_ids'], batch['node_mask'], thetas0):8.1f} ms",
          flush=True)

    # --- sparse feature encoder + decoder + generator (the z tail) ---------
    app = jax.jit(lambda v, bt: model.apply(
        v, bt, False, method=lambda m, b_, tr: m._appearance(b_, tr)))(
        variables, batch)
    sparse = jax.jit(lambda ins, ids, mask, th: generate_sparse_motion(
        ins, ids, mask, th, compute_fw=True, axis_aligned=True))(
        inst, batch["inst_ids"], batch["node_mask"], thetas0)
    dtype = jnp.bfloat16

    def senc_factory(k):
        @jax.jit
        def fused(seed, v, x):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                x_i = x + jax.random.uniform(s, (), dtype=x.dtype, maxval=1e-4)
                out = model.apply(v, x_i, False,
                                  method=lambda m, a, tr:
                                  m.sparse_feature_encoder(a, tr))
                acc = acc + out["enco_sparse_0"].astype(jnp.float32).mean()
            return acc
        return fused

    sm_bw = sparse["sparse_motion_bw"].astype(dtype)
    print(f"sparse enc:     {slope(senc_factory, variables, sm_bw):8.1f} ms",
          flush=True)

    def dec_factory(k):
        @jax.jit
        def fused(seed, v, app_, sm_, occ_):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                z = jax.random.normal(s, (b, 1024))
                ap_i = dict(app_)
                ap_i["app_encoded"] = app_["app_encoded"] + \
                    jax.random.uniform(s, (), dtype=dtype, maxval=1e-4)
                sf = model.apply(v, sm_.astype(dtype), False,
                                 method=lambda m, a, tr:
                                 m.sparse_feature_encoder(a, tr))
                zc = model.apply(v, z, ap_i["app_encoded"],
                                 method=lambda m, zz, ae: m._motion_code(zz, ae))
                out = model.apply(v, ap_i, sf, sm_, occ_, zc, False,
                                  method=lambda m, *a: m.dense_generator_bw(*a))
                acc = acc + out["dense_motion"].astype(jnp.float32).mean()
            return acc
        return fused

    print(f"senc+code+dec:  {slope(dec_factory, variables, app, sparse['sparse_motion_bw'], sparse['sparse_occ_bw']):8.1f} ms",
          flush=True)

    # --- generator ----------------------------------------------------------
    dense = jax.jit(lambda v, ap_, sm_, oc_, z: model.apply(
        v, ap_, model.apply(v, sm_.astype(dtype), False,
                            method=lambda m, a, tr:
                            m.sparse_feature_encoder(a, tr)),
        sm_, oc_, model.apply(v, z, ap_["app_encoded"],
                              method=lambda m, zz, ae: m._motion_code(zz, ae)),
        False, method=lambda m, *a: m.dense_generator_bw(*a)))(
        variables, app, sparse["sparse_motion_bw"], sparse["sparse_occ_bw"],
        jax.random.normal(key, (b, 1024)))

    def gen_factory(k):
        @jax.jit
        def fused(seed, v, bt, dn):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                dn_i = dict(dn)
                dn_i["dense_motion"] = dn["dense_motion"] + \
                    jax.random.uniform(s, (), dtype=dn["dense_motion"].dtype,
                                       maxval=1e-4)
                out = model.apply(v, jitter(bt, s), dn_i, False,
                                  method=lambda m, b_, d_, tr:
                                  m._generate_frames(b_, d_, train=tr))
                acc = acc + out.astype(jnp.float32).mean()
            return acc
        return fused

    print(f"generator:      {slope(gen_factory, variables, batch, dense):8.1f} ms",
          flush=True)

    # --- previews -----------------------------------------------------------
    out0 = dict(sparse)  # winner_bw / sparse_occ_bw / sparse_motion_bw

    def prev_factory(k):
        @jax.jit
        def fused(seed, v, bt, o):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                bt_i = jitter(bt, s)
                out = model.apply(v, bt_i, o, bt_i["targets_theta"], True,
                                  method=lambda m, b_, o_, th, ax:
                                  m._sparse_previews(b_, o_, th,
                                                     axis_aligned=ax))
                first = next(iter(out.values()))
                acc = acc + first.astype(jnp.float32).mean()
            return acc
        return fused

    print(f"previews:       {slope(prev_factory, variables, batch, out0):8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
