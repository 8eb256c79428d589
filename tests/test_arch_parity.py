"""Architecture-parity golden tests: layer widths must match the
reference model definitions (channel progressions cited per model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.models import init_model

KEY = jax.random.PRNGKey(0)


def kernel_shapes(params):
    flat = jax.tree_util.tree_leaves_with_path(params)
    return {
        jax.tree_util.keystr(p): tuple(leaf.shape)
        for p, leaf in flat
        if leaf.ndim >= 2
    }


def init_points_model(name, mode, max_point=1024):
    spec = init_model(name, mode, 16, 50, max_point=max_point)
    pts = jnp.zeros((2, max_point, 3))
    args = (pts, jnp.zeros((2,), jnp.int32)) if mode == "seg" else (pts,)
    return spec.model.init(KEY, *args, train=False)["params"]


def test_pointnet_basic_clas_widths():
    """Reference classify/pointnet_base/pointnet_base.py:8-33 —
    mlp1 3→64→64, mlp2 64→64→128→1024, fc 1024→512→256→classes."""
    ks = kernel_shapes(init_points_model("pointnet_basic", "clas"))
    assert ks["['PointMLP_0']['Dense_0']['kernel']"] == (3, 64)
    assert ks["['PointMLP_0']['Dense_1']['kernel']"] == (64, 64)
    assert ks["['PointMLP_1']['Dense_0']['kernel']"] == (64, 64)
    assert ks["['PointMLP_1']['Dense_1']['kernel']"] == (64, 128)
    assert ks["['PointMLP_1']['Dense_2']['kernel']"] == (128, 1024)
    assert ks["['MLPHead_0']['Dense_0']['kernel']"] == (1024, 512)
    assert ks["['MLPHead_0']['Dense_1']['kernel']"] == (512, 256)
    assert ks["['MLPHead_0']['Dense_2']['kernel']"] == (256, 16)


def test_pointnet_clas_tnet_widths():
    """Reference classify/pointnet/pointnet_Conv1D.py — input T-Net
    3→64→128→1024 + FC 1024→512→256→9; feature T-Net ends at 64*64."""
    ks = kernel_shapes(init_points_model("pointnet", "clas"))
    assert ks["['input_tnet']['PointMLP_0']['Dense_0']['kernel']"] == (3, 64)
    assert ks["['input_tnet']['PointMLP_0']['Dense_1']['kernel']"] == (64, 128)
    assert ks["['input_tnet']['PointMLP_0']['Dense_2']['kernel']"] == (128, 1024)
    assert ks["['input_tnet']['Dense_2']['kernel']"] == (256, 9)
    assert ks["['feature_tnet']['Dense_2']['kernel']"] == (256, 64 * 64)


def test_pointnet2_ssg_clas_sa_widths():
    """Reference classify/pointnet2/pointnet2.py:11-23 — SA1 [64,64,128]
    on 3ch input, SA2 [128,128,256] on 128+3, SA3 [256,512,1024] on
    256+3; head 1024→512→256→classes."""
    ks = kernel_shapes(init_points_model("pointnet2_ssg", "clas"))
    assert ks["['SetAbstraction_0']['PointMLP_0']['Dense_0']['kernel']"] == (3, 64)
    assert ks["['SetAbstraction_0']['PointMLP_0']['Dense_2']['kernel']"] == (64, 128)
    assert ks["['SetAbstraction_1']['PointMLP_0']['Dense_0']['kernel']"] == (131, 128)
    assert ks["['SetAbstraction_1']['PointMLP_0']['Dense_2']['kernel']"] == (128, 256)
    assert ks["['SetAbstraction_2']['PointMLP_0']['Dense_0']['kernel']"] == (259, 256)
    assert ks["['SetAbstraction_2']['PointMLP_0']['Dense_2']['kernel']"] == (512, 1024)
    assert ks["['MLPHead_0']['Dense_0']['kernel']"] == (1024, 512)


def test_pointnet2_msg_clas_branch_widths():
    """Reference MSG SA1: branches [[32,32,64],[64,64,128],[64,96,128]]
    over 0+3 input channels → concat 320ch into SA2 branches."""
    ks = kernel_shapes(init_points_model("pointnet2_msg", "clas"))
    # SA1 branch 0 first layer: 3 -> 32
    assert ks["['SetAbstractionMsg_0']['PointMLP_0']['Dense_0']['kernel']"] == (3, 32)
    assert ks["['SetAbstractionMsg_0']['PointMLP_1']['Dense_0']['kernel']"] == (3, 64)
    assert ks["['SetAbstractionMsg_0']['PointMLP_2']['Dense_2']['kernel']"] == (96, 128)
    # SA2 input channels: 64+128+128 + 3 rel-xyz = 323
    assert ks["['SetAbstractionMsg_1']['PointMLP_0']['Dense_0']['kernel']"] == (323, 64)


def test_pointnet2_seg_fp_widths():
    """Reference segment/pointnet2/pointnet2.py:14-23 — fp3 1280→[256,256],
    fp2 384→[256,128], fp1 (128+16+6)→[128,128,128], head 128→50."""
    ks = kernel_shapes(init_points_model("pointnet2_ssg", "seg"))
    assert ks["['FeaturePropagation_0']['PointMLP_0']['Dense_0']['kernel']"] == (1280, 256)
    assert ks["['FeaturePropagation_1']['PointMLP_0']['Dense_0']['kernel']"] == (384, 256)
    assert ks["['FeaturePropagation_2']['PointMLP_0']['Dense_0']['kernel']"] == (150, 128)
    assert ks["['_SegHead2_0']['Dense_1']['kernel']"] == (128, 50)


def test_vfe_clas_widths():
    """Reference classify/vfe/vfe.py — trunk 3→…→256, concat → 512→…→
    max_points(1024), head 1024→512→256→classes."""
    ks = kernel_shapes(init_points_model("vfe", "clas"))
    assert ks["['VFEBlock_0']['PointMLP_1']['Dense_2']['kernel']"] == (128, 256)
    assert ks["['VFEBlock_0']['PointMLP_2']['Dense_0']['kernel']"] == (512, 64)
    assert ks["['VFEBlock_0']['PointMLP_3']['Dense_2']['kernel']"] == (128, 1024)


def test_pointpillars_rpn_widths():
    """Reference yaml BACKBONE: filters [64,128,256], upsample
    [128,128,128]; heads: box 2*7, cls 2*1, dir 2*2; PFN 9→64."""
    from papc_tpu.detect.model import PointPillars

    model = PointPillars(ny=32, nx=32, num_class=1)
    voxels = jnp.zeros((1, 64, 16, 4))
    num_points = jnp.ones((1, 64), jnp.int32)
    coords = jnp.zeros((1, 64, 3), jnp.int32)
    params = model.init(KEY, voxels, num_points, coords, train=False)[
        "params"
    ]
    ks = kernel_shapes(params)
    # PFN: 4 raw + 3 cluster + 2 center = 9 -> 64
    assert ks["['pfn']['PFNLayer_0']['Dense_0']['kernel']"] == (9, 64)
    assert ks["['rpn']['_ConvBlock_0']['Conv_0']['kernel']"] == (3, 3, 64, 64)
    assert ks["['rpn']['_ConvBlock_1']['Conv_0']['kernel']"] == (3, 3, 64, 128)
    assert ks["['rpn']['_ConvBlock_2']['Conv_0']['kernel']"] == (3, 3, 128, 256)
    # heads over concat(128*3)=384 channels
    assert ks["['rpn']['Conv_0']['kernel']"] == (1, 1, 384, 2 * 7)
    assert ks["['rpn']['Conv_1']['kernel']"] == (1, 1, 384, 2 * 1)
    assert ks["['rpn']['Conv_2']['kernel']"] == (1, 1, 384, 2 * 2)


def test_voxnet_widths():
    """Reference classify/voxnet/voxnet.py — Conv3D(1→32,k5,s2),
    Conv3D(32→32,k3), FC 32*6^3→128→classes."""
    spec = init_model("voxnet", "clas", num_classes=10)
    vox = jnp.zeros((1, 32, 32, 32, 1))
    ks = kernel_shapes(
        spec.model.init(KEY, vox, train=False)["params"]
    )
    assert ks["['Conv_0']['kernel']"] == (5, 5, 5, 1, 32)
    assert ks["['Conv_1']['kernel']"] == (3, 3, 3, 32, 32)
    assert ks["['Dense_0']['kernel']"] == (32 * 6 * 6 * 6, 128)
    assert ks["['Dense_1']['kernel']"] == (128, 10)


def test_vfe_tile_concat_chain():
    """Reference classify/vfe/vfe.py:72-86 — the VFE quirk: stage-1
    per-point features [B, N, F] are concatenated with the GLOBAL max
    tiled back onto every point, so stage-2 consumes [per-point ||
    global] with the global half identical across points, and the
    stage-2 output width is (oddly) max_points itself."""
    from papc_tpu.models.classify.vfe import VFEBlock

    B, N, F, MP = 2, 64, 256, 1024
    block = VFEBlock(feature_channels=F, max_points=MP)
    pts = jax.random.normal(KEY, (B, N, 3))
    params = block.init(KEY, pts, train=False)
    x1, x2 = block.apply(params, pts, train=False)
    # concat layout: [B, N, 2F]; x2 width == max_points
    assert x1.shape == (B, N, 2 * F)
    assert x2.shape == (B, N, MP)
    # the global half is constant across points and equals the per-point
    # half's max over points
    per_point, tiled_global = x1[..., :F], x1[..., F:]
    np.testing.assert_allclose(
        np.asarray(tiled_global),
        np.broadcast_to(
            np.max(np.asarray(per_point), axis=1, keepdims=True),
            tiled_global.shape,
        ),
        rtol=1e-6,
    )
    # stage-2 trunk input width is 2F = 512 (reference pointnet_2 takes
    # feature_channels*2)
    ks = kernel_shapes(params["params"])
    assert ks["['PointMLP_2']['Dense_0']['kernel']"] == (2 * F, 64)
    assert ks["['PointMLP_3']['Dense_2']['kernel']"] == (128, MP)


def test_vfe_seg_tile_concat_chain():
    """Reference segment/vfe/vfe.py:83-97 + VFE_Seg — the seg variant
    tiles the pooled stage-2 global feature [B, 1, max_points] back onto
    every point and concatenates with x1, so the seg head consumes
    2F + max_points = 1536 channels."""
    ks = kernel_shapes(init_points_model("vfe", "seg"))
    assert ks["['SegHead_0']['PointMLP_0']['Dense_0']['kernel']"] == (
        2 * 256 + 1024,
        512,
    )


def test_kdunet_skip_topology():
    """Reference segment/kdunet/kdunet.py:51-53,77-96 — the KDUNet
    quirk: skips are captured BEFORE each kdconv (the level's input, not
    its output), which yields the odd decoder concat widths
    1024/768/320/288/131:

    - doubleconv1: deconv(1024→512) ++ skip[-1] (level-5 input, 512ch)
    - doubleconv2: deconv(512→512) ++ skip[-2] (level-4 input, 256ch)
    - doubleconv3: deconv(512→256) ++ skip[-3] (level-3 input, 64ch)
    - doubleconv4: deconv(256→256) ++ skip[-4] (level-2 input, 32ch)
    - doubleconv5: deconv(128→128) ++ skip[-5] (raw xyz, 3ch) = 131
    """
    spec = init_model("kdunet", "seg", num_classes=50, max_point=1024)
    pts = jnp.zeros((1, 1024, 3))
    splits = tuple(
        jnp.zeros((1, 1024 >> l), jnp.int32) for l in range(5)
    )
    ks = kernel_shapes(
        spec.model.init(KEY, pts, splits, train=False)["params"]
    )
    assert ks["['ConvTranspose_0']['kernel']"] == (2, 1024, 512)
    assert ks["['PointMLP_0']['Dense_0']['kernel']"] == (1024, 512)
    assert ks["['ConvTranspose_1']['kernel']"] == (2, 512, 512)
    assert ks["['PointMLP_1']['Dense_0']['kernel']"] == (768, 512)
    assert ks["['ConvTranspose_2']['kernel']"] == (2, 512, 256)
    assert ks["['PointMLP_2']['Dense_0']['kernel']"] == (320, 256)
    assert ks["['ConvTranspose_3']['kernel']"] == (2, 256, 256)
    assert ks["['PointMLP_3']['Dense_0']['kernel']"] == (288, 128)
    assert ks["['ConvTranspose_4']['kernel']"] == (2, 128, 128)
    assert ks["['PointMLP_4']['Dense_0']['kernel']"] == (131, 128)
    assert ks["['Dense_0']['kernel']"] == (128, 50)


def test_direction_target_pi_flip_edges():
    """Reference detectors/pointpillars.py:575-585 — the direction
    target is STRICTLY ``rot_gt > 0``: yaw exactly 0 and exactly -pi
    are class 0, +pi is class 1. Also the predict-side opposite-
    direction fix (reference :369-374): add pi where sign(yaw)>0 XOR
    dir-label."""
    from papc_tpu.detect.detector import get_direction_target

    # anchors carry yaw in the last dim; reg target adds the residual
    yaws = jnp.array([-np.pi, -1e-6, 0.0, 1e-6, np.pi])
    anchors = jnp.zeros((1, 5, 7)).at[..., -1].set(yaws)
    reg_targets = jnp.zeros((1, 5, 7))
    t = get_direction_target(anchors, reg_targets, one_hot=False)
    np.testing.assert_array_equal(np.asarray(t)[0], [0, 0, 0, 1, 1])
    # one-hot form matches
    oh = get_direction_target(anchors, reg_targets, one_hot=True)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(oh, -1))[0], [0, 0, 0, 1, 1]
    )
    # the same boundary through a reg-target residual that lands the sum
    # exactly on 0: anchor yaw pi, residual -pi -> class 0
    anchors2 = jnp.zeros((1, 1, 7)).at[..., -1].set(np.pi)
    regs2 = jnp.zeros((1, 1, 7)).at[..., -1].set(-np.pi)
    t2 = get_direction_target(anchors2, regs2, one_hot=False)
    assert int(t2[0, 0]) == 0


def test_predict_opposite_direction_flip():
    """Reference detectors/pointpillars.py:369-374 — +pi is added to the
    decoded yaw exactly where (yaw > 0) XOR dir_label, with yaw exactly
    0 counted as the non-positive side (strict >)."""
    from papc_tpu.detect.detector import apply_direction_flip

    yaw = jnp.array([-1.0, -1.0, 1.0, 1.0, 0.0, 0.0])
    boxes = jnp.zeros((6, 7)).at[:, -1].set(yaw)
    dirs = jnp.array([0, 1, 0, 1, 0, 1])
    fixed = apply_direction_flip(boxes, dirs)
    # yaw<=0 & dir=1 flips; yaw>0 & dir=0 flips; 0 counts as non-positive
    np.testing.assert_allclose(
        np.asarray(fixed[:, -1]),
        [-1.0, -1.0 + np.pi, 1.0 + np.pi, 1.0, 0.0, np.pi],
        rtol=1e-6,
    )


def test_kdnet_widths():
    """Reference classify/kdnet/kdnet.py — 10 levels with feature widths
    (32,64,64,128,128,256,256,512,512,128), each Dense to 3*width."""
    spec = init_model("kdnet", "clas", num_classes=16, max_point=1024)
    pts = jnp.zeros((1, 1024, 3))
    splits = tuple(
        jnp.zeros((1, 1024 >> l), jnp.int32) for l in range(10)
    )
    ks = kernel_shapes(
        spec.model.init(KEY, pts, splits, train=False)["params"]
    )
    assert ks["['KDConv_0']['Dense_0']['kernel']"] == (3, 96)
    assert ks["['KDConv_1']['Dense_0']['kernel']"] == (32, 192)
    assert ks["['KDConv_9']['Dense_0']['kernel']"] == (512, 384)
    assert ks["['Dense_0']['kernel']"] == (128, 16)
