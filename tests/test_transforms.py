"""Transform helper tests (rotation validity, sampler geometry)."""

import numpy as np

from caspr_tpu.utils.transforms import (
    angles_to_normals,
    axis_angle_to_matrix,
    normals_to_angles,
    quaternion_to_matrix,
    random_rotation,
    random_sphere_points,
    rotation_axis,
    sphere_surface_points,
)


def _assert_rotation(r):
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-9)


def test_quaternion_identity():
    np.testing.assert_allclose(
        quaternion_to_matrix([1, 0, 0, 0]), np.eye(3), atol=1e-12
    )


def test_axis_angle_z90():
    r = axis_angle_to_matrix([0, 0, np.pi / 2])
    np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-9)


def test_random_rotations_valid():
    rng = np.random.RandomState(0)
    for _ in range(10):
        _assert_rotation(random_rotation(rng))
    _assert_rotation(rotation_axis([0.0, 1.0, 0.0], 0.7))


def test_sphere_samplers():
    rng = np.random.RandomState(1)
    surf = sphere_surface_points(500, radius=0.5, rng=rng)
    np.testing.assert_allclose(np.linalg.norm(surf, axis=1), 0.5, atol=1e-9)
    vol = random_sphere_points(500, radius=0.5, rng=rng)
    assert np.all(np.linalg.norm(vol, axis=1) <= 0.5 + 1e-9)


def test_normals_angles_roundtrip():
    rng = np.random.RandomState(2)
    n = rng.randn(4, 5, 6, 3)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    back = angles_to_normals(normals_to_angles(n))
    np.testing.assert_allclose(np.abs(back), np.abs(n), atol=1e-6)
    # direction preserved (not just magnitude)
    np.testing.assert_allclose(back, n, atol=1e-6)
