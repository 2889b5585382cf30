"""HSNet side-car tests: CP4D semantics vs a literal torch oracle of the
reference op, correlation grouping, and the end-to-end tiny forward."""

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.config import ResNetConfig
from lseg_tpu.models.hsnet import (
    CenterPivotConv4d,
    HSNet,
    multilayer_correlation,
    predict_mask_nshot,
)


def test_cp4d_matches_torch_oracle():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    b, ha, wa, hb, wb, c, f, k, s = 2, 5, 6, 6, 5, 3, 4, 3, 2
    x = rng.randn(b, ha, wa, hb, wb, c).astype(np.float32)

    mod = CenterPivotConv4d(features=f, kernel=k, stride=s)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))

    # literal reference semantics (base/conv4d.py:36-58) with the same
    # weights (flax HWIO -> torch OIHW)
    wq = np.transpose(
        np.asarray(variables["params"]["conv_query"]["kernel"]),
        (3, 2, 0, 1),
    )
    bq = np.asarray(variables["params"]["conv_query"]["bias"])
    ws = np.transpose(
        np.asarray(variables["params"]["conv_support"]["kernel"]),
        (3, 2, 0, 1),
    )
    bs = np.asarray(variables["params"]["conv_support"]["bias"])

    xt = torch.from_numpy(
        x.transpose(0, 5, 1, 2, 3, 4)
    )  # (b, c, ha, wa, hb, wb)
    pruned = xt[:, :, :, :, ::s, ::s]
    hb2, wb2 = pruned.shape[4], pruned.shape[5]
    a = pruned.permute(0, 4, 5, 1, 2, 3).reshape(-1, c, ha, wa)
    a = F.conv2d(a, torch.from_numpy(wq), torch.from_numpy(bq),
                 padding=k // 2)
    out1 = a.reshape(b, hb2, wb2, f, ha, wa).permute(0, 3, 4, 5, 1, 2)
    v = xt.permute(0, 2, 3, 1, 4, 5).reshape(-1, c, hb, wb)
    v = F.conv2d(v, torch.from_numpy(ws), torch.from_numpy(bs),
                 stride=s, padding=k // 2)
    out2 = v.reshape(b, ha, wa, f, hb2, wb2).permute(0, 3, 1, 2, 4, 5)
    ref = (out1 + out2).numpy().transpose(0, 2, 3, 4, 5, 1)

    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_multilayer_correlation_grouping():
    rng = np.random.RandomState(0)
    # 2 + 3 + 2 taps (layer2, layer3, layer4 sizes)
    feats_q, feats_s = [], []
    for n, hw, c in [(2, 8, 4), (3, 4, 8), (2, 2, 8)]:
        for _ in range(n):
            feats_q.append(jnp.asarray(
                rng.randn(1, hw, hw, c).astype(np.float32)))
            feats_s.append(jnp.asarray(
                rng.randn(1, hw, hw, c).astype(np.float32)))
    pyr = multilayer_correlation(feats_q, feats_s, (2, 3, 2))
    assert pyr[0].shape == (1, 2, 2, 2, 2, 2)    # layer4 group
    assert pyr[1].shape == (1, 4, 4, 4, 4, 3)    # layer3 group
    assert pyr[2].shape == (1, 8, 8, 8, 8, 2)    # layer2 group
    for p in pyr:
        assert float(jnp.min(p)) >= 0.0          # relu clamp
    # cosine bound
    assert float(jnp.max(pyr[0])) <= 1.0 + 1e-5


def test_hsnet_forward_and_nshot():
    cfg = ResNetConfig(layers=(1, 1, 1, 1))
    model = HSNet(resnet=cfg)
    q = jnp.zeros((1, 32, 32, 3))
    s = jnp.zeros((1, 32, 32, 3))
    m = jnp.ones((1, 32, 32), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), q, s, m)
    out = model.apply(variables, q, s, m)
    assert out.shape == (1, 32, 32, 2)

    def apply_fn(qi, si, mi):
        return model.apply(variables, qi, si, mi)

    batch = {
        "query_img": q,
        "support_imgs": jnp.zeros((1, 2, 32, 32, 3)),
        "support_masks": jnp.ones((1, 2, 32, 32), jnp.int32),
    }
    pred = predict_mask_nshot(apply_fn, batch, nshot=2)
    assert pred.shape == (1, 32, 32)
    assert set(np.unique(np.asarray(pred))) <= {0, 1}


def test_hsnet_original_imgsize_protocol():
    """use_original_imgsize: the model emits HPN-resolution logits and
    predict_mask_nshot resizes to the episode's original query size
    before argmax (reference: hsnet.py:55-75, test.py:63)."""
    cfg = ResNetConfig(layers=(1, 1, 1, 1))
    model = HSNet(resnet=cfg, use_original_imgsize=True)
    q = jnp.zeros((1, 32, 32, 3))
    s = jnp.zeros((1, 32, 32, 3))
    m = jnp.ones((1, 32, 32), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), q, s, m)
    logits = model.apply(variables, q, s, m)
    # HPN native resolution (layer2 grid x2 via the decoder upsample),
    # NOT the input size
    assert logits.shape[1] < 32 or logits.shape[1] == 16

    def apply_fn(qi, si, mi):
        return model.apply(variables, qi, si, mi)

    batch = {
        "query_img": q,
        "support_imgs": jnp.zeros((1, 1, 32, 32, 3)),
        "support_masks": jnp.ones((1, 1, 32, 32), jnp.int32),
    }
    pred = predict_mask_nshot(apply_fn, batch, nshot=1,
                              org_size=(47, 31))
    assert pred.shape == (1, 47, 31)
    assert set(np.unique(np.asarray(pred))) <= {0, 1}


def test_vgg16_taps_and_hsnet():
    import torch
    import torch.nn.functional as F

    from lseg_tpu.models.vgg import (
        VGG16Features, convert_torchvision_vgg16, HSNET_VGG_TAPS,
        _VGG16_LAYOUT,
    )

    # build a torchvision-shaped features state_dict by hand
    rng = np.random.RandomState(0)
    sd = {}
    idx, cin = 0, 3
    for item in _VGG16_LAYOUT:
        if item == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = (
            rng.randn(item, cin, 3, 3).astype(np.float32) * 0.05
        )
        sd[f"features.{idx}.bias"] = (
            rng.randn(item).astype(np.float32) * 0.05
        )
        cin = item
        idx += 2
    params = convert_torchvision_vgg16(sd)
    model = VGG16Features()
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    taps = model.apply({"params": params}, x)
    assert len(taps) == len(HSNET_VGG_TAPS)
    # strides 8, 8, 8, 16, 16, 16, 32
    assert [t.shape[1] for t in taps] == [8, 8, 8, 4, 4, 4, 2]

    # numeric parity against a functional torch replica of the layout
    y = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
    feats = []
    idx = 0
    for item in _VGG16_LAYOUT:
        if item == "M":
            y = F.max_pool2d(y, 2, 2)
            if idx in HSNET_VGG_TAPS:
                feats.append(y.numpy().transpose(0, 2, 3, 1))
            idx += 1
        else:
            y = F.conv2d(
                y, torch.from_numpy(sd[f"features.{idx}.weight"]),
                torch.from_numpy(sd[f"features.{idx}.bias"]), padding=1,
            )
            if idx in HSNET_VGG_TAPS:
                feats.append(y.numpy().transpose(0, 2, 3, 1))
            idx += 1
            y = F.relu(y)
            if idx in HSNET_VGG_TAPS:
                feats.append(y.numpy().transpose(0, 2, 3, 1))
            idx += 1
    for ours, ref in zip(taps, feats):
        # 13 stacked fp32 convs across different backends: tolerate
        # accumulation-order drift
        np.testing.assert_allclose(np.asarray(ours), ref,
                                   rtol=1e-2, atol=1e-3)

    # HSNet with the vgg backbone runs end to end
    net = HSNet(backbone="vgg16")
    q = jnp.zeros((1, 32, 32, 3))
    m = jnp.ones((1, 32, 32), jnp.int32)
    variables = net.init(jax.random.PRNGKey(0), q, q, m)
    out = net.apply(variables, q, q, m)
    assert out.shape == (1, 32, 32, 2)
