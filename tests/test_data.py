"""Data-layer tests: obj parsing (python + native parity), vertex normals, FDI remap
golden table, normalization constants, augmentation semantics, dataset/batching."""

import json
import os

import numpy as np
import pytest

from toothgroupnetwork_tpu.data import (
    parse_obj,
    compute_vertex_normals,
    load_mesh_arr,
    fdi_to_class,
    class_to_fdi,
    normalize_vertices,
    preprocess_scan,
    Augmentator,
    Scaling,
    Rotation,
    Translation,
    DentalScanDataset,
    BatchLoader,
)
from toothgroupnetwork_tpu.data.fast_obj import parse_obj_fast
from toothgroupnetwork_tpu.data.preprocess import Y_AXIS_MAX, Y_AXIS_MIN, preprocess_dir
from toothgroupnetwork_tpu.data.dataset import make_split_files
from toothgroupnetwork_tpu.data.mesh_io import subdivide_midpoint

from synthetic import write_synthetic_obj, write_synthetic_case, write_processed_npy


class TestObjParsing:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "m.obj")
        verts, faces = write_synthetic_obj(path, n_side=8)
        v, f = parse_obj(path)
        np.testing.assert_allclose(v, verts, atol=1e-5)
        np.testing.assert_array_equal(f, faces)

    def test_face_formats(self, tmp_path):
        path = str(tmp_path / "m.obj")
        with open(path, "w") as fh:
            fh.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n")
            fh.write("f 1 2 3\nf 2//5 3//5 4//5\nf 1/2/3 3/4/5 4/6/7\n")
        v, f = parse_obj(path)
        assert v.shape == (4, 3)
        np.testing.assert_array_equal(
            f, [[0, 1, 2], [1, 2, 3], [0, 2, 3]])

    def test_native_parser_parity(self, tmp_path):
        lib = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native", "libfast_obj.so")
        if not os.path.exists(lib):
            pytest.skip("native parser not built")
        path = str(tmp_path / "m.obj")
        write_synthetic_obj(path, n_side=12, seed=3)
        with open(path, "a") as fh:  # exercise //-format + comments too
            fh.write("# comment\nvn 0 0 1\nf 1//1 2//1 3//1\n")
        fast = parse_obj_fast(path)
        assert fast is not None
        # python fallback: force by parsing manually
        verts, faces = [], []
        with open(path) as fh:
            for raw in fh:
                t = raw.split()
                if not t:
                    continue
                if t[0] == "v":
                    verts.append(list(map(float, t[1:4])))
                elif t[0] == "f":
                    faces.append([int(x.split("/")[0]) for x in t[1:4]])
        np.testing.assert_allclose(fast[0], np.array(verts), atol=1e-9)
        np.testing.assert_array_equal(fast[1], np.array(faces) - 1)

    def test_scientific_notation(self, tmp_path):
        path = str(tmp_path / "m.obj")
        with open(path, "w") as fh:
            fh.write("v 1.5e-3 -2E2 3.25e+1\nv 1 2 3\nv 4 5 6\nf 1 2 3\n")
        v, _ = parse_obj(path)
        np.testing.assert_allclose(v[0], [0.0015, -200.0, 32.5], rtol=1e-12)


class TestVertexNormals:
    def test_flat_sheet_normals_up(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
        faces = np.array([[0, 1, 2], [1, 3, 2]])
        n = compute_vertex_normals(verts, faces)
        np.testing.assert_allclose(n, np.tile([0, 0, 1.0], (4, 1)), atol=1e-12)

    def test_area_weighting(self):
        # vertex 0 shared by a big xy-plane triangle and a small xz-plane triangle:
        # normal should lean strongly toward the big triangle's normal (z).
        verts = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0.1, 0, 0.1]], float)
        faces = np.array([[0, 1, 2], [0, 3, 1]])
        n = compute_vertex_normals(verts, faces)
        assert n[0, 2] > 0.99  # dominated by the big triangle (+z)

    def test_unit_norm(self, tmp_path):
        path = str(tmp_path / "m.obj")
        write_synthetic_obj(path, n_side=10)
        arr = load_mesh_arr(path)
        norms = np.linalg.norm(arr[:, 3:6], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-9)


class TestFDIRemap:
    def test_golden_table_upper(self):
        # FDI 11..18 -> 1..8 ; 21..28 -> 9..16 ; 0 -> 0
        fdi = np.array([0, 11, 12, 18, 21, 22, 28])
        got = fdi_to_class(fdi, "upper")
        np.testing.assert_array_equal(got, [0, 1, 2, 8, 9, 10, 16])

    def test_golden_table_lower(self):
        # lower: 31..38 -> 1..8 ; 41..48 -> 9..16
        fdi = np.array([0, 31, 38, 41, 48])
        got = fdi_to_class(fdi, "lower")
        np.testing.assert_array_equal(got, [0, 1, 8, 9, 16])

    def test_roundtrip(self):
        for jaw in ("upper", "lower"):
            cls = np.arange(17)
            fdi = class_to_fdi(cls, jaw)
            back = fdi_to_class(fdi, jaw)
            np.testing.assert_array_equal(back, cls)

    def test_class_to_fdi_values(self):
        np.testing.assert_array_equal(
            class_to_fdi(np.array([0, 1, 8, 9, 16]), "upper"),
            [0, 11, 18, 21, 28])
        np.testing.assert_array_equal(
            class_to_fdi(np.array([0, 1, 8, 9, 16]), "lower"),
            [0, 31, 38, 41, 48])


class TestNormalization:
    def test_formula(self, rng):
        xyz = rng.uniform(-30, 30, (100, 3))
        got = normalize_vertices(xyz)
        centered = xyz - xyz.mean(0)
        want = (centered - Y_AXIS_MIN) / (Y_AXIS_MAX - Y_AXIS_MIN) * 2 - 1
        np.testing.assert_allclose(got, want, atol=1e-12)


class TestAugment:
    def test_scaling_range(self, rng):
        s = Scaling([0.85, 1.15])
        s.reload_val(rng)
        assert 0.85 <= s.trans_val < 1.15
        arr = np.ones((5, 6), np.float32)
        out = s.augment(arr.copy())
        np.testing.assert_allclose(out[:, :3], s.trans_val, rtol=1e-6)
        np.testing.assert_allclose(out[:, 3:], 1.0)  # normals untouched

    def test_rotation_preserves_norms_and_rotates_normals(self, rng):
        r = Rotation([-30, 30], "fixed")
        r.reload_val(rng)
        arr = rng.standard_normal((10, 6)).astype(np.float32)
        before = np.linalg.norm(arr[:, :3], axis=1)
        out = r.augment(arr.copy())
        np.testing.assert_allclose(np.linalg.norm(out[:, :3], 1), np.linalg.norm(out[:, :3], 1))
        np.testing.assert_allclose(np.linalg.norm(out[:, :3], axis=1), before, rtol=1e-5)
        # fixed axis = z: z coords unchanged
        np.testing.assert_allclose(out[:, 2], arr[:, 2], rtol=1e-5)
        np.testing.assert_allclose(out[:, 5], arr[:, 5], rtol=1e-5)

    def test_translation_moves_xyz_only(self, rng):
        t = Translation([-0.2, 0.2])
        t.reload_val(rng)
        arr = np.zeros((4, 6), np.float32)
        out = t.augment(arr.copy())
        assert (np.abs(out[:, :3]) <= 0.2).all()
        np.testing.assert_allclose(out[:, 3:], 0.0)

    def test_reapply_same_params(self, rng):
        aug = Augmentator([Scaling([0.85, 1.15]), Rotation([-30, 30], "fixed"),
                           Translation([-0.2, 0.2])])
        aug.reload_vals(rng)
        arr = rng.standard_normal((20, 6)).astype(np.float32)
        out1 = aug.run(arr.copy())
        out2 = aug.run(arr.copy())  # same params until reload
        np.testing.assert_allclose(out1, out2, atol=1e-6)


class TestDataset:
    def test_load_and_label_shift(self, tmp_path):
        d = str(tmp_path / "proc")
        write_processed_npy(d, "A1", "lower", n_points=500)
        ds = DentalScanDataset(d)
        assert len(ds) == 1
        item = ds[0]
        assert item["feat"].shape == (500, 6)
        assert item["gt_seg_label"].min() == -1  # gingiva shifted
        assert item["gt_seg_label"].max() <= 15

    def test_split_filter(self, tmp_path):
        d = str(tmp_path / "proc")
        write_processed_npy(d, "A1", "lower")
        write_processed_npy(d, "B2", "upper", seed=1)
        split = str(tmp_path / "split.txt")
        with open(split, "w") as f:
            f.write("A1\n")
        ds = DentalScanDataset(d, split_txt_path=split)
        assert len(ds) == 1
        assert "A1" in ds.mesh_paths[0]

    def test_mask_from_meta(self, tmp_path):
        d = str(tmp_path / "proc")
        write_processed_npy(d, "A1", "lower", n_points=400, n_file_points=512)
        ds = DentalScanDataset(d)
        item = ds[0]
        assert item["mask"].sum() == 400
        assert item["feat"].shape == (512, 6)

    def test_batch_loader(self, tmp_path):
        d = str(tmp_path / "proc")
        for i in range(5):
            write_processed_npy(d, f"C{i}", "lower", n_points=300, seed=i)
        dl = BatchLoader(DentalScanDataset(d), batch_size=2, shuffle=True, seed=1)
        batches = list(dl)
        assert len(batches) == 2  # drop_last
        assert batches[0]["feat"].shape == (2, 300, 6)
        assert batches[0]["gt_seg_label"].shape == (2, 300)
        dl2 = BatchLoader(DentalScanDataset(d), batch_size=2, shuffle=False)
        batches = list(dl2)
        assert len(batches) == 3
        assert batches[-1]["feat"].shape == (2, 300, 6)
        assert batches[-1]["batch_valid"].tolist() == [True, False]


class TestPreprocessEndToEnd:
    def test_preprocess_scan(self, tmp_path):
        obj_path, json_path, n = write_synthetic_case(str(tmp_path), "K9", "lower")
        arr, n_valid, jaw = preprocess_scan(obj_path, json_path)
        assert arr.shape == (24000, 7)
        assert jaw == "lower"
        assert n_valid == n  # 900-vertex mesh -> padded
        labels = arr[:n_valid, 6]
        assert labels.min() >= 0 and labels.max() <= 16
        # normalized coords are in a sane range
        assert np.abs(arr[:n_valid, :3]).max() < 3.0

    def test_preprocess_dir(self, tmp_path):
        write_synthetic_case(str(tmp_path), "K1", "lower")
        write_synthetic_case(str(tmp_path), "K2", "upper", seed=2)
        out = str(tmp_path / "out")
        n = preprocess_dir(str(tmp_path / "objs"), str(tmp_path / "jsons"), out,
                           verbose=False)
        assert n == 2
        files = sorted(os.listdir(out))
        # naming contract (preprocess_data.py:57): f"{obj_basename}_{jaw}_sampled_points";
        # challenge objs are named <case>_<jaw>.obj, so the jaw appears twice.
        assert "K1_lower_lower_sampled_points.npy" in files
        assert "K2_upper_upper_sampled_points.npy" in files
        # padded scans have meta sidecars
        assert "K1_lower_lower_sampled_points.meta.json" in files

    def test_make_split_files(self, tmp_path):
        d = str(tmp_path / "proc")
        for i in range(10):
            write_processed_npy(d, f"S{i}", "lower", n_points=100, seed=i)
        splits = make_split_files(d, str(tmp_path / "splits"), seed=0)
        total = sum(len(v) for v in splits.values())
        assert total == 10
        assert len(splits["train_fold.txt"]) == 8


class TestSubdivide:
    def test_midpoint_counts(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
        faces = np.array([[0, 1, 2]])
        v2, f2 = subdivide_midpoint(verts, faces)
        assert len(v2) == 6 and len(f2) == 4
        # midpoints present
        assert any(np.allclose(v, [0.5, 0, 0]) for v in v2)

    def test_shared_edges_not_duplicated(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
        faces = np.array([[0, 1, 2], [1, 3, 2]])
        v2, f2 = subdivide_midpoint(verts, faces)
        assert len(v2) == 4 + 5  # 5 unique edges
        assert len(f2) == 8


class TestDedupVertices:
    """scan_prep.dedup_vertices — the lexsort grouping must match the
    np.unique(axis=0) contract it replaced (first-occurrence order, faces
    remapped)."""

    def test_matches_np_unique(self, rng):
        from toothgroupnetwork_tpu.data.scan_prep import dedup_vertices

        base = rng.standard_normal((500, 3)).astype(np.float32)
        dup_idx = rng.integers(0, 500, 300)
        verts = np.concatenate([base, base[dup_idx]], 0)
        perm = rng.permutation(len(verts))
        verts = verts[perm]
        faces = rng.integers(0, len(verts), (400, 3))

        v2, f2 = dedup_vertices(verts, faces)

        _, first_idx, inverse = np.unique(verts, axis=0, return_index=True,
                                          return_inverse=True)
        order = np.argsort(first_idx)
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        want_v = verts[np.sort(first_idx)]
        want_f = rank[inverse][faces]

        np.testing.assert_array_equal(v2, want_v)
        np.testing.assert_array_equal(f2, want_f)

    def test_no_duplicates_identity(self, rng):
        from toothgroupnetwork_tpu.data.scan_prep import dedup_vertices

        verts = rng.standard_normal((64, 3)).astype(np.float32)
        faces = rng.integers(0, 64, (30, 3))
        v2, f2 = dedup_vertices(verts, faces)
        np.testing.assert_array_equal(v2, verts)
        np.testing.assert_array_equal(f2, faces)

    def test_negative_zero_merges(self, rng):
        """-0.0 and +0.0 bits differ but np.unique's comparisons treat them
        as equal — the hash prefilter must not skip dedup for such rows."""
        from toothgroupnetwork_tpu.data.scan_prep import dedup_vertices

        verts = np.array([[0.0, 1.0, 2.0],
                          [-0.0, 1.0, 2.0],   # duplicate of row 0 under ==
                          [3.0, 4.0, 5.0]], np.float32)
        faces = np.array([[0, 1, 2]])
        v2, f2 = dedup_vertices(verts, faces)
        assert len(v2) == 2
        np.testing.assert_array_equal(f2, [[0, 0, 1]])

    def test_float64_duplicates(self, rng):
        from toothgroupnetwork_tpu.data.scan_prep import dedup_vertices

        base = rng.standard_normal((100, 3))  # float64 (parse_obj dtype)
        verts = np.concatenate([base, base[:30]], 0)
        v2, f2 = dedup_vertices(verts, np.zeros((0, 3), np.int64))
        assert len(v2) == 100
