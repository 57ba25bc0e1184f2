"""End-to-end data pipeline test on synthetic data: tiler -> pkl
converter -> dataset -> transforms -> collate -> merge -> mAP eval."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from rs_detection_tpu.data.collate import collate_batch
from rs_detection_tpu.data.devkits.convert_data_to_mmdet import \
    convert_data_to_mmdet
from rs_detection_tpu.data.devkits.img_split import process, splitbase
from rs_detection_tpu.data.devkits.result_merge import (mergesingle,
                                                        parse_tile_name)
from rs_detection_tpu.data.devkits.voc_eval import voc_eval_dota
from rs_detection_tpu.data.dota import DOTADataset
from rs_detection_tpu.ops.box_ops import rotated_box_to_poly_np


@pytest.fixture(scope="module")
def synthetic_scene(tmp_path_factory):
    """A 600x500 scene with 3 known boxes, DOTA labelTxt format."""
    root = tmp_path_factory.mktemp("dota_src")
    (root / "images").mkdir()
    (root / "labelTxt").mkdir()
    rng = np.random.RandomState(0)
    img = (rng.rand(500, 600, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(root / "images" / "P0001.png")
    labels = [
        # fully inside the first tile
        ([50, 50, 120, 50, 120, 90, 50, 90], "plane", 0),
        # spanning across tiles
        ([280, 200, 420, 200, 420, 260, 280, 260], "ship", 0),
        # difficult
        ([400, 400, 450, 400, 450, 430, 400, 430], "harbor", 1),
    ]
    with open(root / "labelTxt" / "P0001.txt", "w") as f:
        for poly, name, diff in labels:
            f.write(" ".join(str(v) for v in poly) + f" {name} {diff}\n")
    return str(root)


class TestTiler:
    def test_split_and_convert(self, synthetic_scene, tmp_path):
        out = process(synthetic_scene, str(tmp_path / "tiles"),
                      gap=100, subsize=320, rates=[1.0], num_process=1)
        imgs = os.listdir(os.path.join(out, "images"))
        txts = os.listdir(os.path.join(out, "labelTxt"))
        assert len(imgs) >= 4 and len(imgs) == len(txts)
        # tile naming parses back
        name = os.path.splitext(imgs[0])[0]
        orig, x, y, rate = parse_tile_name(name + "__x")
        assert orig == "P0001"
        # every tile is padded to subsize
        im = Image.open(os.path.join(out, "images", imgs[0]))
        assert im.size == (320, 320)

        pkl_path = os.path.join(out, "labels.pkl")
        convert_data_to_mmdet(out, pkl_path, type="DOTA",
                              angle_version="le135")
        with open(pkl_path, "rb") as f:
            infos = pickle.load(f)
        assert len(infos) >= 1
        total_boxes = sum(len(i["ann"]["bboxes"]) for i in infos)
        assert total_boxes >= 2  # the plane appears in >= 1 tile
        for info in infos:
            assert info["ann"]["bboxes"].shape[1] == 5

    def test_clip_semantics(self, synthetic_scene, tmp_path):
        # a box fully inside one tile keeps difficult=0 and exact size
        sb = splitbase(synthetic_scene, str(tmp_path / "t2"),
                       gap=100, subsize=320, num_process=1)
        sb.splitdata(1.0)
        txt = os.path.join(str(tmp_path / "t2"), "labelTxt",
                           "P0001__1.0__0___0.txt")
        with open(txt) as f:
            lines = [l.split() for l in f.read().strip().split("\n")]
        names = [l[8] for l in lines]
        assert "plane" in names
        plane = lines[names.index("plane")]
        poly = np.asarray([float(v) for v in plane[:8]])
        assert plane[9] == "0"
        assert np.allclose(poly, [50, 50, 120, 50, 120, 90, 50, 90],
                           atol=1.0)


class TestDatasetAndEval:
    def test_dataset_batches(self, synthetic_scene, tmp_path):
        out = process(synthetic_scene, str(tmp_path / "tiles"),
                      gap=100, subsize=320, rates=[1.0], num_process=1)
        convert_data_to_mmdet(out, os.path.join(out, "labels.pkl"),
                              type="DOTA", angle_version="le135")
        ds = DOTADataset(
            dataset_dir=out, batch_size=2, max_gt=16,
            transforms=[
                dict(type="RotatedResize", min_size=320, max_size=320),
                dict(type="Normalize",
                     mean=[123.675, 116.28, 103.53],
                     std=[58.395, 57.12, 57.375], to_bgr=False),
            ])
        images, targets, metas = next(iter(ds.batches()))
        assert images.shape[1:] == (320, 320, 3)
        assert targets["rboxes"].shape[1:] == (16, 5)
        assert targets["gt_mask"].any()
        assert (targets["labels"][targets["gt_mask"]] > 0).all()

        # multi-worker decode path yields identical batches
        ds.num_workers = 4
        images_w, targets_w, _ = next(iter(ds.batches()))
        np.testing.assert_allclose(np.asarray(images_w),
                                   np.asarray(images))
        np.testing.assert_allclose(np.asarray(targets_w["rboxes"]),
                                   np.asarray(targets["rboxes"]))

    def test_eval_perfect_detections(self, synthetic_scene, tmp_path):
        out = process(synthetic_scene, str(tmp_path / "tiles"),
                      gap=100, subsize=320, rates=[1.0], num_process=1)
        convert_data_to_mmdet(out, os.path.join(out, "labels.pkl"),
                              type="DOTA", angle_version="le135")
        ds = DOTADataset(dataset_dir=out, batch_size=1, max_gt=16,
                         transforms=[])
        # feed GT back as detections -> mAP 1.0 on present classes
        results = []
        for i in range(len(ds)):
            _, tgt = ds[i]
            polys = tgt["polys"]
            scores = np.ones(len(polys))
            results.append(((polys, scores, tgt["labels"]), tgt))
        aps = ds.evaluate(results, None, 0, save=False)
        assert aps["eval/0_meanAP"] > 0
        # classes with GT get AP == 1
        plane_ap = aps["eval/1_plane_AP"]
        assert plane_ap > 0.99

    def test_merge_roundtrip(self, tmp_path):
        # detections on two tiles of one image merge into one
        before = tmp_path / "before"
        after = tmp_path / "after"
        before.mkdir()
        lines = [
            # same physical box seen from two overlapping tiles
            "P0001__1.0__0___0 0.9 100 100 150 100 150 130 100 130\n",
            "P0001__1.0__50___0 0.8 50 100 100 100 100 130 50 130\n",
            # distinct box
            "P0001__1.0__0___0 0.7 10 10 30 10 30 20 10 20\n",
        ]
        with open(before / "plane.txt", "w") as f:
            f.writelines(lines)
        mergesingle(str(after), str(before / "plane.txt"))
        with open(after / "plane.txt") as f:
            merged = [l.split() for l in f.read().strip().split("\n")]
        assert len(merged) == 2  # duplicates NMS'd
        assert all(m[0] == "P0001" for m in merged)


class TestVocEval:
    def test_difficult_neither_tp_nor_fp(self):
        gt_poly = np.array([0, 0, 10, 0, 10, 10, 0, 10], np.float64)
        gts = {0: {"box": gt_poly[None], "det": [False],
                   "difficult": np.array([True])}}
        dets = np.array([[0, *gt_poly, 0.9]])
        rec, prec, ap = voc_eval_dota(dets, gts)
        assert ap == 0.0  # npos == 0

    def test_simple_ap(self):
        gt_poly = np.array([0, 0, 10, 0, 10, 10, 0, 10], np.float64)
        far = gt_poly + 100
        gts = {0: {"box": np.stack([gt_poly, far]),
                   "det": [False, False],
                   "difficult": np.array([False, False])}}
        dets = np.array([[0, *gt_poly, 0.9], [0, *(gt_poly + 50), 0.8]])
        rec, prec, ap = voc_eval_dota(dets, gts)
        assert abs(ap - 0.5) < 1e-6


class TestLVIS:
    def _write_lvis(self, tmp_path, n_img=2):
        import json

        from PIL import Image

        (tmp_path / "images").mkdir(exist_ok=True)
        images, anns = [], []
        aid = 1
        for i in range(n_img):
            name = f"img{i}.jpg"
            Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(
                tmp_path / "images" / name)
            images.append(dict(
                id=i + 1, width=64, height=64,
                coco_url=f"http://x/{name}",
                neg_category_ids=[3],
                not_exhaustive_category_ids=[]))
            anns.append(dict(id=aid, image_id=i + 1, category_id=1,
                             bbox=[10, 10, 20, 12], area=240,
                             iscrowd=0))
            aid += 1
        cats = [dict(id=c, name=f"c{c}") for c in range(1, 4)]
        path = tmp_path / "lvis.json"
        with open(path, "w") as f:
            json.dump(dict(images=images, annotations=anns,
                           categories=cats), f)
        return str(tmp_path / "images"), str(path)

    def test_lvis_dataset_and_protocol(self, tmp_path):
        import rs_detection_tpu.data  # noqa: F401
        from rs_detection_tpu.utils.registry import DATASETS

        images_dir, ann = self._write_lvis(tmp_path)
        ds = DATASETS.get("LVISDataset")(images_dir=images_dir,
                                         annotations_file=ann,
                                         batch_size=1)
        assert len(ds.CLASSES) == 1203
        assert len(ds.frequencies) == 1203
        # file_name derived from coco_url
        assert ds.img_infos[0]["filename"] == "img0.jpg"

        # perfect detection of cat 1 + spurious detections of cat 2
        # (NOT evaluable: neither annotated nor negative -> ignored)
        # and cat 3 (negative -> counts as FP)
        results = []
        for info in ds.img_infos:
            g = info["ann"]["hboxes"]
            boxes = np.concatenate([g, g, g])
            scores = np.array([1.0, 0.9, 0.8])
            labels = np.array([1, 2, 3])
            results.append((boxes, scores, labels))
        out = ds.evaluate(results, str(tmp_path), 0)
        per = out["per_class_ap50"]
        assert per[0] == pytest.approx(1.0, abs=1e-6)   # cat 1 perfect
        assert per[1] == 0.0                            # cat 2 ignored
        assert per[2] == 0.0                            # cat 3 FP only

    def test_lvis_frequency_split_keys(self, tmp_path):
        import rs_detection_tpu.data  # noqa: F401
        from rs_detection_tpu.utils.registry import DATASETS

        images_dir, ann = self._write_lvis(tmp_path)
        ds = DATASETS.get("LVISDataset")(images_dir=images_dir,
                                         annotations_file=ann,
                                         batch_size=1)
        results = [(i["ann"]["hboxes"], np.ones(1), np.ones(1, int))
                   for i in ds.img_infos]
        out = ds.evaluate(results, str(tmp_path), 0)
        # frequency buckets from the shipped LVIS v1 table
        assert set(ds.frequencies) == {"f", "c", "r"}


class TestDeviceTiler:
    def test_positions_match_host_tiler(self, tmp_path):
        """Window grid == img_split.SplitSingle's loop for assorted
        scene sizes (incl. clamped final windows and tiny scenes)."""
        from rs_detection_tpu.data.device_tiler import tile_positions

        def host_positions(dim, subsize, slide):
            pos = []
            left = 0
            while left < dim:
                if left + subsize >= dim:
                    left = max(dim - subsize, 0)
                pos.append(left)
                if left + subsize >= dim:
                    break
                left += slide
            return pos

        for dim in (100, 1024, 1500, 2048, 4000):
            for subsize, gap in ((1024, 200), (600, 150)):
                assert tile_positions(dim, subsize, subsize - gap) == \
                    host_positions(dim, subsize, subsize - gap), dim

    def test_tiles_match_numpy_windows(self):
        from rs_detection_tpu.data.device_tiler import (tile_positions,
                                                        tile_scene)

        import jax.numpy as jnp

        rng = np.random.RandomState(0)
        scene = (rng.rand(300, 420, 3) * 255).astype(np.uint8)
        subsize, gap = 256, 56
        tiles, offs = tile_scene(jnp.asarray(scene), subsize, gap)
        lefts = tile_positions(420, subsize, subsize - gap)
        ups = tile_positions(300, subsize, subsize - gap)
        assert tiles.shape == (len(lefts) * len(ups), subsize,
                               subsize, 3)
        t = np.asarray(tiles)
        for k, (lf, up) in enumerate(offs):
            ref = scene[up:up + subsize, lf:lf + subsize]
            np.testing.assert_array_equal(
                t[k, :ref.shape[0], :ref.shape[1]], ref)
            # out-of-scene region zero-padded
            if ref.shape[0] < subsize:
                assert (t[k, ref.shape[0]:] == 0).all()

    def test_small_scene_zero_pads(self):
        import jax.numpy as jnp

        from rs_detection_tpu.data.device_tiler import tile_scene

        scene = jnp.ones((60, 80, 3), jnp.uint8) * 7
        tiles, offs = tile_scene(scene, 128, 32)
        assert tiles.shape == (1, 128, 128, 3)
        assert offs.tolist() == [[0, 0]]
        t = np.asarray(tiles[0])
        assert (t[:60, :80] == 7).all()
        assert (t[60:] == 0).all() and (t[:, 80:] == 0).all()


class TestSceneDataset:
    def test_matches_pre_split_image_dataset(self, tmp_path):
        """SceneDataset (device tiling of the raw scene) must produce
        the same normalized model inputs and the same ImgSplit tile
        names as ImageDataset over offline-split tiles."""
        import jax.numpy as jnp
        from PIL import Image

        from rs_detection_tpu.data.image import ImageDataset
        from rs_detection_tpu.data.scene import SceneDataset

        rng = np.random.RandomState(0)
        scene = (rng.rand(200, 220, 3) * 255).astype(np.uint8)
        scenes_dir = tmp_path / "scenes"
        tiles_dir = tmp_path / "tiles"
        scenes_dir.mkdir()
        tiles_dir.mkdir()
        Image.fromarray(scene).save(scenes_dir / "S1.png")

        subsize, gap = 128, 32
        mean = [123.675, 116.28, 103.53]
        std = [58.395, 57.12, 57.375]
        sds = SceneDataset(images_dir=str(scenes_dir), subsize=subsize,
                           gap=gap, batch_size=2, mean=mean, std=std)
        got = {}
        for images, targets, metas in sds.batches():
            arr = np.asarray(images)
            for k, m in enumerate(metas):
                if m is not None:
                    got[m["filename"]] = arr[k]

        # offline split: zero-padded tiles, same window grid
        from rs_detection_tpu.data.device_tiler import tile_positions
        lefts = tile_positions(220, subsize, subsize - gap)
        ups = tile_positions(200, subsize, subsize - gap)
        names = []
        for up in ups:
            for lf in lefts:
                tile = np.zeros((subsize, subsize, 3), np.uint8)
                src = scene[up:up + subsize, lf:lf + subsize]
                tile[:src.shape[0], :src.shape[1]] = src
                name = f"S1__1.0__{lf}___{up}.png"
                Image.fromarray(tile).save(tiles_dir / name)
                names.append(name)
        ids = ImageDataset(
            images_dir=str(tiles_dir), batch_size=1,
            transforms=[dict(type="Normalize", mean=mean, std=std,
                             to_bgr=False)])
        assert set(got) == set(names)
        for images, targets, metas in ids.batches():
            ref = np.asarray(images[0])
            name = metas[0]["filename"]
            np.testing.assert_allclose(got[name], ref, atol=1e-4)

    def test_streams_across_scene_boundaries(self, tmp_path):
        """Batches mix the tail of one scene with the head of the next
        so only the dataset's LAST batch is padded (per-scene padding
        cost 44% on 3x3-grid scenes — docs/perf_notes.md)."""
        from PIL import Image

        from rs_detection_tpu.data.scene import SceneDataset

        rng = np.random.RandomState(2)
        d = tmp_path / "s"
        d.mkdir()
        # two scenes x 4 tiles (2x2 grid at subsize 64, gap 16) = 8
        # tiles; batch 3 -> batches of 3/3/2+pad
        scenes = {}
        for name in ["A", "B"]:
            sc = (rng.rand(112, 112, 3) * 255).astype(np.uint8)
            Image.fromarray(sc).save(d / f"{name}.png")
            scenes[name] = sc
        sds = SceneDataset(images_dir=str(d), subsize=64, gap=16,
                           batch_size=3)
        out = list(sds.batches())
        assert len(out) == 3
        # batch 1 must span both scenes: tile 3 of A + first of B
        names1 = [m["filename"] for m in out[1][2]]
        assert any(n.startswith("A__") for n in names1)
        assert any(n.startswith("B__") for n in names1)
        # only the final batch carries padding
        assert all(m is not None for _, _, ms in out[:2] for m in ms)
        assert [m is None for m in out[2][2]] == [False, False, True]
        # every tile's pixels must match its own scene's window
        for images, _, metas in out:
            arr = np.asarray(images)
            for k, m in enumerate(metas):
                if m is None:
                    continue
                stem = m["filename"].split("__")[0]
                head, up = m["filename"][:-4].split("___")
                lf = int(head.split("__")[-1])
                up = int(up)
                sc = scenes[stem]
                ref = np.zeros((64, 64, 3), np.float64)
                src = sc[up:up + 64, lf:lf + 64].astype(np.float64)
                ref[:src.shape[0], :src.shape[1]] = src
                ref = (ref - sds.mean) / sds.std
                np.testing.assert_allclose(arr[k], ref, atol=1e-4)

    def test_multi_rate_device_resize(self, tmp_path):
        """rates=[0.5, 1.0]: one full-res transfer per scene, per-rate
        device resize with cv2-INTER_CUBIC parity, ImgSplit rate tags
        in the tile names (reference ms recipe,
        ImgSplit_multi_process.py:263-266)."""
        cv2 = pytest.importorskip("cv2")
        from PIL import Image

        from rs_detection_tpu.data.device_tiler import tile_positions
        from rs_detection_tpu.data.scene import SceneDataset

        rng = np.random.RandomState(3)
        scene = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
        d = tmp_path / "s"
        d.mkdir()
        Image.fromarray(scene).save(d / "M.png")

        sds = SceneDataset(images_dir=str(d), subsize=64, gap=16,
                           rates=[0.5, 1.0], batch_size=4)
        got = {}
        for images, _, metas in sds.batches():
            arr = np.asarray(images)
            for k, m in enumerate(metas):
                if m is not None:
                    got[m["filename"]] = arr[k]

        # expected counts: 0.5 -> 64x64 -> 1 tile; 1.0 -> 2x2 grid
        n_half = len(tile_positions(64, 64, 48)) ** 2
        n_full = len(tile_positions(128, 64, 48)) ** 2
        assert len(got) == n_half + n_full
        assert sum(1 for n in got if "__0.5__" in n) == n_half == 1
        assert sum(1 for n in got if "__1.0__" in n) == n_full

        # the 0.5-rate tile must match cv2-resized scene, normalized
        small = cv2.resize(scene.astype(np.float32), (64, 64),
                           interpolation=cv2.INTER_CUBIC)
        ref = (small - sds.mean) / sds.std
        np.testing.assert_allclose(got["M__0.5__0___0.png"], ref,
                                   atol=2e-3)

    def test_flip_mode_tags_and_flips(self, tmp_path):
        from PIL import Image

        from rs_detection_tpu.data.scene import SceneDataset

        rng = np.random.RandomState(1)
        scene = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        d = tmp_path / "s"
        d.mkdir()
        Image.fromarray(scene).save(d / "A.png")
        sds = SceneDataset(images_dir=str(d), subsize=64, gap=16,
                           batch_size=1)
        plain = next(iter(sds.batches()))[0]
        flipped = next(iter(sds.batches(flip_mode="H")))[0]
        np.testing.assert_allclose(np.asarray(plain)[:, :, ::-1],
                                   np.asarray(flipped), atol=1e-5)
        m = next(iter(sds.batches(flip_mode="H")))[2][0]
        assert m["flip_mode"] == "H"
