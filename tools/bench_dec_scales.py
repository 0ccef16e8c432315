#!/usr/bin/env python
"""Per-scale breakdown of the dense-motion decoder (and generator tail) at
the 512x1024 long-horizon shapes (slope protocol, bf16, eval mode).

The parts-level bench (tools/bench_parts_lh.py) shows senc+code+dec at
~171 ms against a padded conv floor of ~16 ms (tools/roofline.py) — this
tool locates the gap by slope-timing each decoder scale stage exactly as
the module wires it (resize -> concat appearance skip -> UpBlock2d ->
resize-down -> concat sparse feature -> SameBlock3d fuse; reference
motion_autoencoder.py:107-149), plus the full-res tail and a few isolated
primitives at the worst shapes.

  python tools/bench_dec_scales.py [--h 512 --w 1024 --t 10] [--s2d]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K_SMALL, K_BIG, REPEATS = 2, 8, 3


def slope(fn, *args, k_big=None):
    """ms per call of fn(x, *rest) with x varied per iteration."""
    K_B = k_big or K_BIG

    def make(k):
        @jax.jit
        def fused(seed, x, *rest):
            acc = 0.0
            for i in range(k):
                s = jax.random.fold_in(seed, i)
                x_i = x + jax.random.uniform(s, (), dtype=x.dtype, maxval=1e-3)
                acc = acc + fn(x_i, *rest).astype(jnp.float32).mean()
            return acc
        return fused

    fs, fb = make(K_SMALL), make(K_B)

    def timed(f, seed):
        t0 = time.perf_counter()
        float(f(jax.random.PRNGKey(seed), *args))
        return time.perf_counter() - t0

    timed(fs, 0)
    timed(fb, 0)
    ts = min(timed(fs, 1 + r) for r in range(REPEATS))
    tb = min(timed(fb, 100 + r) for r in range(REPEATS))
    return (tb - ts) / (K_B - K_SMALL) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--t", type=int, default=10)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--prims-only", action="store_true")
    ap.add_argument("--gen", action="store_true",
                    help="generator stage breakdown instead of decoder")
    args = ap.parse_args()

    from c2m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from c2m_tpu.nn.layers import (SameBlock3d, UpBlock2d, fold_time,
                                   unfold_time)
    from c2m_tpu.models.dense_motion import _PredictorHeads
    from c2m_tpu.ops.warp import resize_bilinear

    H, W, T, B = args.h, args.w, args.t, args.b
    BT = B * T
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].device_kind}  {B}x{H}x{W} T={T} bf16",
          flush=True)

    def rnd(shape):
        return jax.random.normal(key, shape, dt)

    results = []

    # ------------------------------------------------------------------
    # decoder pyramid stages (channels: 512,512,256,128,64,32; app skips
    # enco4..enco1; sparse skips enco_sparse_3..0)
    # scale table for H=512, W=1024 (app enco_j at H/2^j):
    # i=1: prev 16x32 c512, app4 32x64 c256, es3 32x64 c256, out c256
    # i=2: prev 32x64 c256, app3 64x128 c128, es2 64x128 c128, out c128
    # i=3: prev 64x128 c128, app2 128x256 c64, es1 128x256 c64, out c64
    # i=4: prev 128x256 c64, app1 256x512 c32, es0 256x512 c32, out c32
    scales = [
        ("i=1 (ap 32x64, up conv @64x128, c768->256)",
         (H // 32, W // 32, 512), (H // 16, W // 16, 256), 256),
        ("i=2 (ap 64x128, up conv @128x256, c384->128)",
         (H // 16, W // 16, 256), (H // 8, W // 8, 128), 128),
        ("i=3 (ap 128x256, up conv @256x512, c192->64)",
         (H // 8, W // 8, 128), (H // 4, W // 4, 64), 64),
        ("i=4 (ap 256x512, up conv @512x1024, c96->32)",
         (H // 4, W // 4, 64), (H // 2, W // 2, 32), 32),
    ]

    import flax.linen as nn

    class PyrStage(nn.Module):
        cout: int

        @nn.compact
        def __call__(self, x, app, sp):
            hs2, ws2 = app.shape[1], app.shape[2]
            if x.shape[1:3] != (hs2, ws2):
                x = resize_bilinear(x, (hs2, ws2), align_corners=False)
            x = jnp.concatenate([x, app], axis=-1)
            x = UpBlock2d(self.cout, 3, 1, 1, "reflect", dtype=dt,
                          name="up")(x, train=False)
            if x.shape[1:3] != (hs2, ws2):
                x = resize_bilinear(x, (hs2, ws2), align_corners=False)
            out = unfold_time(x, T)
            out = SameBlock3d(self.cout, 3, 1, 1, padding_mode="reflect",
                              dtype=dt, name="fuse")(
                jnp.concatenate([out, sp], axis=-1), train=False)
            f, _ = fold_time(out)
            return f

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, x, sm):
            # final_up + final_fuse + heads (plain layout)
            xf = UpBlock2d(32, 3, 1, 1, "reflect", dtype=dt,
                           name="final_up")(x, train=False)
            out = unfold_time(xf, T)
            out = SameBlock3d(32, 3, 1, 1, padding_mode="reflect", dtype=dt,
                              name="final_fuse")(
                jnp.concatenate([out, sm], axis=-1), train=False)
            flat, _ = fold_time(out)
            flow, occ = _PredictorHeads(dtype=dt, name="heads")(flat)
            return flow.astype(jnp.float32).mean() + occ.astype(
                jnp.float32).mean()

    def run(name, module, x, *rest, k_big=None):
        variables = jax.jit(lambda k: module.init(k, x, *rest))(
            jax.random.PRNGKey(1))
        ms = slope(lambda x_, *r: module.apply(variables, x_, *r), x, *rest,
                   k_big=k_big)
        results.append((name, ms))
        print(f"{name:46s} {ms:8.2f} ms", flush=True)

    if args.gen:
        # generator (OcclusionAwareGenerator) stages at LH shapes, s2d wiring
        # as models/generator.py uses at 512x1024 (entry/exit s2d)
        from c2m_tpu.nn import s2d as _s2dm
        from c2m_tpu.nn import s2d_blocks as sb
        from c2m_tpu.nn.layers import DownBlock2d, ResidualBlock, SameBlock2d
        from c2m_tpu.ops.warp import resample

        def run(name, module, x, *rest, k_big=None):
            variables = jax.jit(lambda k: module.init(k, x, *rest))(
                jax.random.PRNGKey(1))
            ms = slope(lambda x_, *r: module.apply(variables, x_, *r), x,
                       *rest, k_big=k_big)
            print(f"{name:46s} {ms:8.2f} ms", flush=True)

        import flax.linen as nn

        class Entry(nn.Module):  # first + down_0 (s2d path)
            @nn.compact
            def __call__(self, x):
                y = sb.SameBlock2dS2d(32, 7, "reflect", dtype=dt,
                                      name="first")(_s2dm.to_s2d(x))
                return sb.DownBlock2dS2dIn(64, "reflect", dtype=dt,
                                           name="down_0")(y, train=False)

        class EntryPlain(nn.Module):  # first + down_0 (plain path)
            @nn.compact
            def __call__(self, x):
                y = SameBlock2d(32, 7, 1, 3, padding_mode="reflect",
                                dtype=dt, name="first")(x)
                return DownBlock2d(64, 4, 2, 1, padding_mode="reflect",
                                   dtype=dt, name="down_0")(y, train=False)

        class Mod(nn.Module):
            fn_name: str

            @nn.compact
            def __call__(self, x, *rest):
                if self.fn_name == "down1":
                    return DownBlock2d(128, 4, 2, 1, padding_mode="reflect",
                                       dtype=dt, name="d")(x, train=False)
                if self.fn_name == "down2":
                    return DownBlock2d(256, 4, 2, 1, padding_mode="reflect",
                                       dtype=dt, name="d")(x, train=False)
                if self.fn_name == "res":
                    return ResidualBlock(256, 3, 1, dtype=dt,
                                         name="r")(x, train=False)
                if self.fn_name == "up0":
                    return UpBlock2d(128, 3, 1, 1, "reflect", dtype=dt,
                                     name="u")(x, train=False)
                if self.fn_name == "up1":
                    return UpBlock2d(64, 3, 1, 1, "reflect", dtype=dt,
                                     name="u")(x, train=False)
                if self.fn_name == "up2s2d":
                    y = sb.UpBlock2dS2d(32, 3, "reflect", dtype=dt,
                                        name="u")(x, train=False)
                    y = sb.ConvS2d(3, 7, "zeros", dtype=dt, name="final")(y)
                    return _s2dm.from_s2d(y)
                raise ValueError(self.fn_name)

        run("G entry s2d (first k7 + down_0) @512x1024",
            Entry(), rnd((BT, H, W, 3)), k_big=4)
        run("G entry PLAIN (first k7 + down_0)",
            EntryPlain(), rnd((BT, H, W, 3)), k_big=4)
        run("G down_1 [10,256,512,64]->128", Mod("down1"),
            rnd((BT, H // 2, W // 2, 64)))
        run("G down_2 [10,128,256,128]->256", Mod("down2"),
            rnd((BT, H // 4, W // 4, 128)))
        run("G residual x1 [10,64,128,256]", Mod("res"),
            rnd((BT, H // 8, W // 8, 256)))
        run("G up_0 [10,64,128,256]->128 @128x256", Mod("up0"),
            rnd((BT, H // 8, W // 8, 256)))
        run("G up_1 [10,128,256,128]->64 @256x512", Mod("up1"),
            rnd((BT, H // 4, W // 4, 128)))
        run("G up_2+final s2d [10,256,512,64]->rgb", Mod("up2s2d"),
            rnd((BT, H // 2, W // 2, 64)), k_big=4)

        def prim2(name, f, x, *rest, k_big=None):
            ms = slope(f, x, *rest, k_big=k_big)
            print(f"{name:46s} {ms:8.2f} ms", flush=True)

        flow = rnd((BT, H, W, 2))
        feat = rnd((BT, H // 8, W // 8, 256))
        prim2("G apply_optical @bottleneck (flow resize+warp)",
              lambda f_, fl: resample(
                  f_, resize_bilinear(fl, (H // 8, W // 8),
                                      align_corners=False)) ,
              feat, flow)
        return

    if not args.prims_only:
        for name, (hp, wp, cp), (ha, wa, ca), cout in scales:
            x = rnd((BT, hp, wp, cp))
            app = rnd((BT, ha, wa, ca))
            sp = rnd((B, T, ha, wa, ca))
            run(f"pyr {name}", PyrStage(cout), x, app, sp)

        x = rnd((BT, H // 2, W // 2, 32))
        sm = rnd((B, T, H, W, 2))
        run("tail (final_up+fuse+heads @512x1024)", Tail(), x, sm, k_big=4)

    # ------------------------------------------------------------------
    # isolated primitives at the i=4 / tail shapes: where do the bytes go?
    # ------------------------------------------------------------------
    def prim(name, f, x, *rest, k_big=None):
        ms = slope(f, x, *rest, k_big=k_big)
        results.append((name, ms))
        print(f"{name:46s} {ms:8.2f} ms", flush=True)

    from c2m_tpu.nn.layers import BatchNorm, Conv

    def run_mod(name, module, x, *rest, k_big=None, train_arg=False):
        if train_arg:
            variables = jax.jit(lambda k: module.init(k, x, *rest,
                                                      train=False))(
                jax.random.PRNGKey(1))
            fn = lambda x_, *r: module.apply(variables, x_, *r, train=False)
        else:
            variables = jax.jit(lambda k: module.init(k, x, *rest))(
                jax.random.PRNGKey(1))
            fn = lambda x_, *r: module.apply(variables, x_, *r)
        ms = slope(fn, x, *rest, k_big=k_big)
        results.append((name, ms))
        print(f"{name:46s} {ms:8.2f} ms", flush=True)

    # i=4 sub-pieces
    run_mod("UpBlock2d(32) alone [10,256,512,96]->1024",
            UpBlock2d(32, 3, 1, 1, "reflect", dtype=dt),
            rnd((BT, H // 2, W // 2, 96)), k_big=4, train_arg=True)
    run_mod("SameBlock3d(32) alone [1,10,256,512,64]",
            SameBlock3d(32, 3, 1, 1, padding_mode="reflect", dtype=dt),
            rnd((B, T, H // 2, W // 2, 64)), train_arg=True)
    run_mod("conv 96->32 zero-pad @512x1024 (floor)",
            Conv(32, 3, 1, 1, "zeros", dtype=dt),
            rnd((BT, H, W, 96)), k_big=4)
    run_mod("conv 96->32 reflect @512x1024",
            Conv(32, 3, 1, 1, "reflect", dtype=dt),
            rnd((BT, H, W, 96)), k_big=4)
    run_mod("BN eval+leaky [10,512,1024,32]",
            BatchNorm(dtype=dt), rnd((BT, H, W, 32)), train_arg=True)
    prim("resize up2x   [10,256,512,96]->512x1024",
         lambda x: resize_bilinear(x, (H, W)),
         rnd((BT, H // 2, W // 2, 96)), k_big=4)
    prim("resize down2x [10,512,1024,32]->256x512",
         lambda x: resize_bilinear(x, (H // 2, W // 2)),
         rnd((BT, H, W, 32)))
    prim("resize down2x [10,64,128,256]->32x64",
         lambda x: resize_bilinear(x, (H // 16, W // 16)),
         rnd((BT, H // 8, W // 8, 256)))
    prim("resize up4x   [10,128,256,64]->512 (generic)",
         lambda x: resize_bilinear(x, (H // 2, W // 2)),
         rnd((BT, H // 4, W // 4, 64)))
    prim("concat 32+32  [1,10,256,512,*] (copy floor)",
         lambda x, y: jnp.concatenate([x, y], -1) * 1.0,
         rnd((B, T, H // 2, W // 2, 32)), rnd((B, T, H // 2, W // 2, 32)))
    prim("elementwise *2 [10,512,1024,96] (HBM floor)",
         lambda x: x * 2.0, rnd((BT, H, W, 96)), k_big=4)


if __name__ == "__main__":
    main()
