"""Correlation cost-volume + FlowNet2 structure tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2m_tpu.ops.correlation import channel_norm, correlation


def test_correlation_reference_loop():
    rng = np.random.RandomState(0)
    a = rng.randn(1, 6, 8, 4).astype(np.float32)
    b = rng.randn(1, 6, 8, 4).astype(np.float32)
    md, stride = 4, 2
    out = np.asarray(correlation(jnp.asarray(a), jnp.asarray(b),
                                 max_displacement=md, stride=stride))
    d = 2 * (md // stride) + 1
    assert out.shape == (1, 6, 8, d * d)
    # oracle: naive python loop
    pb = np.pad(b, ((0, 0), (md, md), (md, md), (0, 0)))
    k = 0
    for dy in range(-md, md + 1, stride):
        for dx in range(-md, md + 1, stride):
            for y in range(6):
                for x in range(8):
                    ref = np.mean(a[0, y, x] * pb[0, md + dy + y, md + dx + x])
                    assert abs(out[0, y, x, k] - ref) < 1e-5
            k += 1


def test_correlation_identity_peak():
    # identical inputs -> the zero-displacement channel dominates
    rng = np.random.RandomState(1)
    a = rng.randn(1, 8, 8, 16).astype(np.float32)
    out = np.asarray(correlation(jnp.asarray(a), jnp.asarray(a),
                                 max_displacement=4, stride=2))
    d = out.shape[-1]
    center = d // 2
    interior = out[0, 4:5, 4:5]
    assert interior[..., center].min() >= interior.max(axis=-1).min() - 1e-6


def test_channel_norm():
    x = jnp.asarray([[[[3.0, 4.0]]]])
    np.testing.assert_allclose(np.asarray(channel_norm(x)), [[[[5.0]]]])


@pytest.mark.skipif(not os.environ.get("C2M_HEAVY_TESTS"),
                    reason="FlowNet2 init is heavy on the 1-core CPU runner; "
                           "set C2M_HEAVY_TESTS=1")
def test_flownet2_shapes():
    from c2m_tpu.models.flownet2 import FlowNet2, compute_flow_and_conf
    model = FlowNet2()
    im = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), im, im)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    assert n_params > 100e6  # reference: 162.5M (models.py:18)
    flow, conf = compute_flow_and_conf(model.apply, variables, im, im)
    assert flow.shape == (1, 64, 64, 2)
    assert conf.shape == (1, 64, 64, 1)


def test_onthefly_flow_with_converted_weights(tmp_path):
    """OnTheFlyFlow end-to-end: random reference torch FlowNet2 -> converter
    -> finite flows/occlusions with the trainer's batch contract
    (reference Trainer.compute_flow, trainer.py:42-98)."""
    torch = pytest.importorskip("torch")
    from tests.ref_shims import add_ref_paths
    add_ref_paths()
    from modules.third_party.flow_net.flownet2.models import \
        FlowNet2 as TorchFlowNet2
    from tools.convert_flownet2 import convert
    from c2m_tpu.train.flow_onthefly import OnTheFlyFlow

    class _Args:
        fp16 = False
        rgb_max = 1.0

    torch.manual_seed(14)
    net = TorchFlowNet2(_Args(), use_batch_norm=False)
    params = convert(net.state_dict())
    path = tmp_path / "flownet2_rand.npz"
    np.savez(path, params=np.asarray(params, dtype=object))

    otf = OnTheFlyFlow(num_input_frames=1, num_predicted_frames=2,
                       weights_path=str(path))
    video = jnp.asarray(np.random.RandomState(0).rand(1, 3, 64, 64, 3)
                        .astype(np.float32))
    out = otf(video)
    for key in ("target_bw_of", "target_fw_of"):
        assert out[key].shape == (1, 2, 64, 64, 2), out[key].shape
        assert np.isfinite(np.asarray(out[key])).all()
    for key in ("target_bw_occ", "target_fw_occ"):
        assert out[key].shape == (1, 2, 64, 64, 1)
        o = np.asarray(out[key])
        assert o.min() >= 0.0 and o.max() <= 1.0
