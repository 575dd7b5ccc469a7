"""FID math + visualizers."""
import numpy as np
import pytest

from magicdrive_tpu.eval.fid import (
    activation_statistics, calculate_frechet_distance,
)
from magicdrive_tpu.viz import concat_6_views, visualize_map
from magicdrive_tpu.viz.box_viz import draw_boxes_on_views


def test_frechet_closed_form():
    # identical Gaussians -> 0
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 8))
    mu, s = activation_statistics(f)
    assert abs(calculate_frechet_distance(mu, s, mu, s)) < 1e-6
    # mean shift only: FID = ||d||^2
    d = np.full(8, 0.5)
    val = calculate_frechet_distance(mu, s, mu + d, s)
    assert abs(val - d @ d) < 1e-6
    # diagonal covariances: trace(s1 + s2 - 2 sqrt(s1 s2))
    s1 = np.diag(np.arange(1.0, 9.0))
    s2 = np.diag(np.arange(2.0, 10.0))
    expected = np.trace(s1 + s2 - 2 * np.sqrt(s1 @ s2))
    assert abs(calculate_frechet_distance(np.zeros(8), s1, np.zeros(8), s2)
               - expected) < 1e-6


def test_inception_shapes():
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from magicdrive_tpu.eval.inception import InceptionV3Pool3

    model = InceptionV3Pool3()
    x = jnp.zeros((1, 299, 299, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 2048)


def test_visualize_map():
    rng = np.random.default_rng(0)
    m = (rng.random((200, 200, 18)) > 0.95).astype(np.float32)
    from magicdrive_tpu.data.fixtures import MAP_CLASSES, OBJECT_CLASSES

    img = visualize_map(m, MAP_CLASSES, OBJECT_CLASSES, target_size=200)
    assert img.dtype == np.uint8 and img.ndim == 3
    assert img.shape[0] >= 200 and img.shape[1] >= 200


def test_box_overlay_and_grid():
    from magicdrive_tpu.data.fixtures import OBJECT_CLASSES, make_sample

    s = make_sample(0, image_hw=(64, 112))
    imgs = (np.asarray(s["img"]) + 1) / 2
    out = draw_boxes_on_views(imgs, s["boxes"], s["labels"],
                              s["lidar2image"], s["img_aug_matrix"],
                              classes=OBJECT_CLASSES)
    assert out.shape == (6, 64, 112, 3) and out.dtype == np.uint8
    # some boxes are in front of some camera -> some pixels drawn
    assert (out.astype(np.int32) - (imgs * 255).astype(np.int32)).any()
    sheet = concat_6_views(out / 255.0)
    assert sheet.shape == (128, 336, 3)


def test_flip_aug_consistency():
    from magicdrive_tpu.data.bbox import corners_from_boxes, transform_points
    from magicdrive_tpu.data.fixtures import make_sample
    from magicdrive_tpu.data.flip import flip_sample

    s = make_sample(1, image_hw=(32, 56))
    f = flip_sample(s, "vertical")
    # scene mirrored in x: box x negated
    np.testing.assert_allclose(f["boxes"][:, 0], -s["boxes"][:, 0])
    # lidar2image stays consistent with K @ inv(c2l)
    np.testing.assert_allclose(
        f["lidar2image"],
        f["camera_intrinsics"] @ np.linalg.inv(f["camera2lidar"]), atol=1e-8)
    # a box visible in original FRONT view stays visible in flipped FRONT
    # (mirror symmetry maps front to front with x negated)
    corners = corners_from_boxes(f["boxes"])
    cam = transform_points(corners, f["lidar2camera"][1])
    assert np.isfinite(cam).all()
    # map flipped along H axis
    np.testing.assert_allclose(np.asarray(f["bev_map"]),
                               np.asarray(s["bev_map"])[::-1])
