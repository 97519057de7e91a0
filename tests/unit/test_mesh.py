"""Unit tests: triangle-mesh kernels, mesh shapes, tree elements.

Reference components: mesh shapes (``scenes/shapes/_filemesh.py`` /
``_buffermesh.py``), trees (``scenes/biosphere/_tree.py``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from eradiate_tpu.ops.mesh import (
    TriangleMeshArrays,
    cone_mesh,
    cylinder_mesh,
    mesh_from_vertices,
    ray_tris_nearest,
    ray_tris_occluded,
)
from eradiate_tpu.scenes.biosphere import (
    AbstractTree,
    DiscreteCanopy,
    InstancedCanopyElement,
    MeshTree,
    MeshTreeElement,
    biosphere_factory,
)
from eradiate_tpu.scenes.shapes import (
    BufferMeshShape,
    CuboidShape,
    FileMeshShape,
    RectangleShape,
    SphereShape,
    load_obj,
    shape_factory,
)


def _unit_square_tris():
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=float)
    f = np.array([[0, 1, 2], [0, 2, 3]])
    return mesh_from_vertices(v, f)


def test_ray_tri_hit_and_miss():
    tris = _unit_square_tris()
    p = jnp.asarray([[0.5, 0.5, 1.0], [2.0, 2.0, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, n, hit = ray_tris_nearest(p, d, jnp.full(2, 10.0), tris)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(float(t[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.abs(np.asarray(n[0])), [0, 0, 1], atol=1e-6)


def test_ray_tri_nearest_of_two_planes():
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 0.5], [1, 0, 0.5], [0, 1, 0.5]],
        dtype=float,
    )
    f = np.array([[0, 1, 2], [3, 4, 5]])
    tris = mesh_from_vertices(v, f)
    p = jnp.asarray([[0.2, 0.2, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, n, hit = ray_tris_nearest(p, d, jnp.full(1, 10.0), tris)
    np.testing.assert_allclose(float(t[0]), 1.5, rtol=1e-6)  # upper plane first


def test_ray_tri_occlusion():
    tris = _unit_square_tris()
    p = jnp.asarray([[0.5, 0.5, -1.0], [0.5, 0.5, 0.5]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    occ = ray_tris_occluded(p, d, jnp.full(2, 10.0), tris)
    assert bool(occ[0]) and not bool(occ[1])


def test_ray_tri_respects_tmax():
    tris = _unit_square_tris()
    p = jnp.asarray([[0.5, 0.5, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    occ = ray_tris_occluded(p, d, jnp.full(1, 0.5), tris)
    assert not bool(occ[0])


def test_chunking_consistency():
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, (30, 3))
    f = rng.integers(0, 30, (100, 3))
    tris = mesh_from_vertices(v, f)
    p = jnp.asarray(rng.uniform(-1, 1, (16, 3)) + np.array([0, 0, 3.0]))
    d = jnp.asarray(np.broadcast_to([0.0, 0.0, -1.0], (16, 3)))
    tmax = jnp.full(16, 10.0)
    t1, _, h1 = ray_tris_nearest(p, d, tmax, tris, chunk=512)
    t2, _, h2 = ray_tris_nearest(p, d, tmax, tris, chunk=7)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_cylinder_mesh_watertight_from_above():
    v, f = cylinder_mesh(0.5, 2.0, n_seg=24)
    tris = mesh_from_vertices(v, f)
    # rays from above inside the radius must hit (cap)
    rng = np.random.default_rng(1)
    rr = 0.45 * np.sqrt(rng.uniform(0, 1, 64))
    ang = rng.uniform(0, 2 * np.pi, 64)
    p = jnp.asarray(
        np.stack([rr * np.cos(ang), rr * np.sin(ang), np.full(64, 5.0)], axis=-1)
    )
    d = jnp.asarray(np.broadcast_to([0.0, 0.0, -1.0], (64, 3)))
    _, _, hit = ray_tris_nearest(p, d, jnp.full(64, 100.0), tris)
    assert np.asarray(hit).all()


def test_shape_elements_triangles():
    for shape in (
        RectangleShape(edges=(2.0, 2.0)),
        CuboidShape(edges=(1.0, 1.0, 1.0)),
        SphereShape(radius=1.0),
    ):
        v, f = shape.triangles()
        assert v.ndim == 2 and v.shape[1] == 3
        assert f.ndim == 2 and f.shape[1] == 3
        assert f.max() < v.shape[0]


def test_shape_factory():
    s = shape_factory.convert({"type": "buffer_mesh",
                               "vertices": [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                               "faces": [[0, 1, 2]]})
    assert isinstance(s, BufferMeshShape)
    v, f = s.triangles()
    assert v.shape == (3, 3) and f.shape == (1, 3)


def test_obj_loader_roundtrip(tmp_path):
    path = tmp_path / "tri.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
    )
    v, f = load_obj(path)
    assert v.shape == (4, 3)
    assert f.shape == (2, 3)  # quad fan-triangulated
    fm = FileMeshShape(filename=str(path), mesh_units="m")
    v_km, _ = fm.triangles()
    np.testing.assert_allclose(v_km, v * 1e-3)


def test_abstract_tree_parts():
    tree = AbstractTree(
        leaf_cloud={
            "construct": "sphere",
            "n_leaves": 50,
            "leaf_radius": 0.05,
            "radius": 1.0,
            "center": (0, 0, 0),
        },
        trunk_height=2.0,
        trunk_radius=0.1,
        trunk_reflectance=0.2,
    )
    cloud = tree.leaf_part()
    # crown shifted up by trunk height (2 m = 0.002 km)
    assert cloud.positions[:, 2].mean() > 0.0015
    v, f, refl, trans = tree.mesh_part()
    assert refl == 0.2 and trans == 0.0
    assert v[:, 2].min() < 0  # trunk extends below ground
    assert v[:, 2].max() >= 0.002 - 1e-9


def test_mesh_tree_merges_elements(tmp_path):
    p1 = tmp_path / "a.obj"
    p1.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    tree = MeshTree(
        mesh_tree_elements=[
            {"mesh_filename": str(p1), "mesh_units": "m", "reflectance": 0.3},
            {"mesh_filename": str(p1), "mesh_units": "m", "reflectance": 0.9},
        ]
    )
    v, f, refl, trans = tree.mesh_part()
    assert v.shape == (6, 3) and f.shape == (2, 3)
    assert refl == 0.3  # first element wins


def test_canopy_flatten_full_with_trees():
    tree = AbstractTree(
        leaf_cloud={
            "construct": "sphere",
            "n_leaves": 20,
            "leaf_radius": 0.05,
            "radius": 0.5,
            "center": (0, 0, 0),
        },
        trunk_height=1.0,
        trunk_radius=0.05,
    )
    canopy = DiscreteCanopy(
        size=(10.0, 10.0, 3.0),
        instanced_canopy_elements=[
            InstancedCanopyElement(
                canopy_element=tree,
                instance_positions=np.array([[-0.002, 0, 0], [0.002, 0, 0]]),
            )
        ],
    )
    flat, mesh = canopy.flatten_full()
    assert flat.n_leaves == 40
    assert mesh is not None
    assert mesh["faces"].max() < mesh["vertices"].shape[0]


def test_factory_tree_registration():
    t = biosphere_factory.convert(
        {
            "type": "abstract_tree",
            "leaf_cloud": {
                "construct": "cuboid",
                "n_leaves": 10,
                "leaf_radius": 0.05,
                "l_horizontal": 1.0,
                "l_vertical": 1.0,
            },
            "trunk_height": 1.0,
        }
    )
    assert isinstance(t, AbstractTree)
