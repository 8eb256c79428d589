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
