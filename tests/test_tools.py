"""Tests for converters, ensemble merging, checkpoint conversion,
visualization, and the YOLO dataset."""

import os
import pickle
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))


class TestEnsemble:
    def test_hbb_nms(self):
        from merge_results import hbb_nms_numpy

        boxes = np.array([
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],
            [50, 50, 60, 60, 0.7],
        ])
        keep = hbb_nms_numpy(boxes, 0.5)
        assert keep.tolist() == [0, 2]

    def test_csv_roundtrip(self, tmp_path):
        from merge_results import (merge_csv_with_class,
                                   read_csv_to_numpy, save_to_csv)

        csv1 = tmp_path / "a.csv"
        rows = [
            "1.tif,Ship,0.9,10,10,30,10,30,20,10,20\n",
            "1.tif,Ship,0.8,11,11,31,11,31,21,11,21\n",
            "1.tif,Airplane,0.7,50,50,70,50,70,60,50,60\n",
        ]
        csv1.write_text("".join(rows))
        csv2 = tmp_path / "b.csv"
        csv2.write_text(rows[0])
        d1 = read_csv_to_numpy(str(csv1))
        d2 = read_csv_to_numpy(str(csv2))
        assert d1.shape == (3, 11)
        merged = merge_csv_with_class([d1, d2], 0.625)
        # the two overlapping ships collapse; airplane survives
        assert merged.shape[0] == 2
        out = tmp_path / "merged.csv"
        save_to_csv(merged, str(out))
        assert len(out.read_text().strip().split("\n")) == 2

    def test_soft_nms(self):
        from merge_results import soft_nms_numpy

        boxes = np.array([[0, 0, 10, 10, 0.9], [0, 0, 10, 10, 0.85],
                          [50, 50, 60, 60, 0.7]])
        keep = soft_nms_numpy(boxes.copy(), thresh=0.5)
        assert 0 in keep and 2 in keep


class TestCheckpointConvert:
    def test_torch_layout_conversion(self):
        from rs_detection_tpu.utils.checkpoint_convert import (
            compare_trees, torch_state_to_flax)

        state = {
            "backbone.conv1.weight": np.zeros((64, 3, 7, 7)),
            "backbone.bn1.weight": np.ones((64,)),
            "backbone.bn1.bias": np.zeros((64,)),
            "backbone.bn1.running_mean": np.zeros((64,)),
            "backbone.bn1.running_var": np.ones((64,)),
            "backbone.bn1.num_batches_tracked": np.array(100),
            "head.fc.weight": np.zeros((10, 256)),
            "head.fc.bias": np.zeros((10,)),
        }
        params, bs = torch_state_to_flax(state)
        assert params["backbone"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
        assert params["backbone"]["bn1"]["scale"].shape == (64,)
        assert params["head"]["fc"]["kernel"].shape == (256, 10)
        assert bs["backbone"]["bn1"]["mean"].shape == (64,)
        assert "num_batches_tracked" not in str(params)

        # diff tooling
        rep = compare_trees(params, params)
        assert rep == {}
        other = {"backbone": params["backbone"]}
        rep = compare_trees(params, other)
        assert any("head" in k for k in rep)


class TestFairConverters:
    def test_fair_xml_roundtrip(self, tmp_path):
        from rs_detection_tpu.data.devkits.dota_to_fair import (
            dota_to_fair, dota_to_fair1m_1_5)
        from rs_detection_tpu.data.devkits.fair_to_dota import solve_xml

        dets = tmp_path / "after_nms"
        dets.mkdir()
        (dets / "Ship.txt").write_text(
            "P0001 0.95 10 10 30 10 30 20 10 20\n")
        out_xml = tmp_path / "fair/test"
        dota_to_fair(str(dets), str(out_xml), "")
        files = os.listdir(out_xml)
        assert files == ["1.xml"]
        # parse it back
        back_txt = tmp_path / "back.txt"
        solve_xml(str(out_xml / "1.xml"), str(back_txt))
        line = back_txt.read_text().strip().split(" ")
        assert line[8] == "Ship"
        assert [float(v) for v in line[:8]] == [10, 10, 30, 10, 30, 20,
                                                10, 20]

        csv = dota_to_fair1m_1_5(str(dets), str(tmp_path / "csvdir"),
                                 "", "sub")
        content = open(csv).read()
        assert content.startswith("1.tif,Ship,0.95")


class TestYoloDataset:
    def test_mosaic_batches(self, tmp_path):
        import rs_detection_tpu.data as D

        (tmp_path / "images").mkdir()
        rng = np.random.RandomState(0)
        infos = []
        for i in range(4):
            name = f"im_{i}.png"
            Image.fromarray((rng.rand(96, 96, 3) * 255).astype(
                np.uint8)).save(tmp_path / "images" / name)
            infos.append(dict(
                filename=name, width=96, height=96,
                ann=dict(hboxes=np.array([[10, 10, 50, 40]], np.float32),
                         labels=np.array([1], np.int64))))
        with open(tmp_path / "labels.pkl", "wb") as f:
            pickle.dump(infos, f)
        ds = D.YoloDataset(dataset_dir=str(tmp_path), img_size=64,
                           batch_size=2, max_gt=16)
        images, targets, metas = next(iter(ds.batches(seed=0)))
        assert images.shape == (2, 64, 64, 3)
        assert images.max() <= 1.0
        assert targets["hboxes"].shape == (2, 16, 4)

    def test_full_augmentation_pipeline(self, tmp_path):
        """Perspective + mosaic9 + mixup + cutout paths (reference
        LoadImagesAndLabels options) all produce valid samples."""
        import random as _random

        import rs_detection_tpu.data as D

        (tmp_path / "images").mkdir()
        rng = np.random.RandomState(1)
        infos = []
        for i in range(6):
            name = f"im_{i}.png"
            Image.fromarray((rng.rand(80, 96, 3) * 255).astype(
                np.uint8)).save(tmp_path / "images" / name)
            infos.append(dict(
                filename=name, width=96, height=80,
                ann=dict(hboxes=np.array([[8, 8, 60, 48],
                                          [20, 30, 70, 70]], np.float32),
                         labels=np.array([1, 2], np.int64))))
        with open(tmp_path / "labels.pkl", "wb") as f:
            pickle.dump(infos, f)
        ds = D.YoloDataset(
            dataset_dir=str(tmp_path), img_size=64, batch_size=2,
            max_gt=16,
            random_perspective=dict(degrees=10, translate=0.1,
                                    scale=0.1, shear=5,
                                    perspective=0.0005),
            mixup_prob=1.0, mosaic9_prob=0.5, cutout_prob=1.0)
        _random.seed(0)
        for i in range(4):
            img, tgt = ds[i % len(ds)]
            assert img.shape == (64, 64, 3)
            assert np.isfinite(img).all() and img.max() <= 1.0
            b = tgt["hboxes"]
            if b.size:
                assert (b[:, 2] >= b[:, 0]).all()
                assert (b[:, 3] >= b[:, 1]).all()
                assert b.min() >= 0 and b.max() <= 64

    def test_letterbox_non_mosaic(self, tmp_path):
        import rs_detection_tpu.data as D
        from rs_detection_tpu.data.yolo import letterbox

        (tmp_path / "images").mkdir()
        Image.fromarray(np.zeros((40, 96, 3), np.uint8)).save(
            tmp_path / "images" / "a.png")
        infos = [dict(filename="a.png", width=96, height=40,
                      ann=dict(hboxes=np.array([[0, 0, 96, 40]],
                                               np.float32),
                               labels=np.array([1], np.int64)))]
        with open(tmp_path / "labels.pkl", "wb") as f:
            pickle.dump(infos, f)
        ds = D.YoloDataset(dataset_dir=str(tmp_path), img_size=64,
                           batch_size=1, max_gt=4, mosaic=False,
                           hsv=False, flip=False)
        img, tgt = ds[0]
        assert img.shape == (64, 64, 3)
        # aspect preserved: content is 64 wide, 64*40/96 tall, centered
        b = tgt["hboxes"][0]
        assert abs((b[2] - b[0]) - 64) < 2
        assert abs((b[3] - b[1]) - 64 * 40 / 96) < 2
        # standalone letterbox: stride-aligned auto padding
        out, ratio, (dw, dh) = letterbox(
            np.zeros((40, 96, 3), np.uint8), 64, auto=True, stride=32)
        assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0


class TestVisualization:
    def test_draw(self, tmp_path):
        from rs_detection_tpu.utils.visualization import draw_bboxes

        img = Image.new("RGB", (64, 64), (0, 0, 0))
        polys = np.array([[10, 10, 30, 10, 30, 20, 10, 20]])
        out = draw_bboxes(img, polys, np.array([0.9]), np.array([1]),
                          ["plane"])
        arr = np.asarray(out)
        assert arr.sum() > 0  # something was drawn


class TestOfflineEval:
    def test_csv_vs_xml(self, tmp_path):
        from val import evaluate

        xml_dir = tmp_path / "xml"
        xml_dir.mkdir()
        xml = """<?xml version="1.0"?><annotation><objects>
        <object><possibleresult><name>Ship</name></possibleresult>
        <points><point>10,10</point><point>30,10</point>
        <point>30,20</point><point>10,20</point>
        <point>10,10</point></points></object>
        </objects></annotation>"""
        (xml_dir / "1.xml").write_text(xml)
        csv = tmp_path / "sub.csv"
        csv.write_text("1.tif,Ship,0.9,10,10,30,10,30,20,10,20\n")
        aps = evaluate(str(csv), str(xml_dir))
        assert aps["Ship"] > 0.99
        assert "meanAP" in aps


class TestSSDDConverter:
    def test_plus_and_plain(self, tmp_path):
        from rs_detection_tpu.data.devkits.ssdd_to_dota import ssdd_to_dota

        imgs = tmp_path / "imgs"
        annos = tmp_path / "annos"
        imgs.mkdir(); annos.mkdir()
        Image.new("RGB", (100, 50)).save(imgs / "s1.jpg")
        annos.joinpath("s1.xml").write_text("""<annotation><object>
          <name>ship</name><difficult>0</difficult>
          <rotated_bndbox><x1>10</x1><y1>10</y1><x2>30</x2><y2>10</y2>
          <x3>30</x3><y3>20</y3><x4>10</x4><y4>20</y4></rotated_bndbox>
          <bndbox><xmin>10</xmin><ymin>10</ymin><xmax>30</xmax>
          <ymax>20</ymax></bndbox>
        </object></annotation>""")
        out = tmp_path / "dota"
        ssdd_to_dota(str(imgs), str(annos), str(out), resize=200,
                     plus=True)
        assert (out / "images" / "s1.png").exists()
        line = (out / "labelTxt" / "s1.txt").read_text().split()
        # x scaled by 200/100=2, y by 200/50=4
        assert line[:4] == ["20.0", "40.0", "60.0", "40.0"]
        assert line[8] == "ship"


class TestCocoEval:
    def test_perfect_predictions_ap1(self, tmp_path):
        import json

        import rs_detection_tpu.data as D

        (tmp_path / "images").mkdir()
        coco = dict(
            images=[dict(id=1, file_name="a.png", width=64, height=64),
                    dict(id=2, file_name="b.png", width=64, height=64)],
            categories=[dict(id=7, name="cat")],
            annotations=[
                dict(id=1, image_id=1, category_id=7,
                     bbox=[10, 10, 20, 12], iscrowd=0),
                dict(id=2, image_id=2, category_id=7,
                     bbox=[30, 20, 10, 10], iscrowd=0)])
        p = tmp_path / "ann.json"
        p.write_text(json.dumps(coco))
        ds = D.COCODataset(images_dir=str(tmp_path / "images"),
                           annotations_file=str(p))
        results = [
            (np.array([[10, 10, 30, 22]]), np.array([0.9]),
             np.array([1])),
            (np.array([[30, 20, 40, 30]]), np.array([0.8]),
             np.array([1]))]
        out = ds.evaluate(results)
        assert out["eval/AP50"] > 0.99
        assert out["eval/mAP"] > 0.99

    def test_misses_lower_ap(self, tmp_path):
        import json

        import rs_detection_tpu.data as D

        coco = dict(
            images=[dict(id=1, file_name="a.png", width=64, height=64)],
            categories=[dict(id=1, name="c")],
            annotations=[dict(id=1, image_id=1, category_id=1,
                              bbox=[10, 10, 20, 12], iscrowd=0)])
        p = tmp_path / "ann.json"
        p.write_text(json.dumps(coco))
        ds = D.COCODataset(annotations_file=str(p))
        # detection far away -> fp only
        out = ds.evaluate([(np.array([[50, 50, 60, 60]]),
                            np.array([0.9]), np.array([1]))])
        assert out["eval/mAP"] == 0.0


class TestTileMerge:
    def test_mergebypoly_coords_and_dedup(self, tmp_path):
        from rs_detection_tpu.data.devkits.result_merge import (
            mergebypoly, parse_tile_name, poly2origpoly)

        name, x, y, rate = parse_tile_name("P0001__1.0__512___0")
        assert (name, x, y, rate) == ("P0001", 512, 0, 1.0)
        p = poly2origpoly([0, 0, 10, 0, 10, 10, 0, 10], 512, 0, 1.0)
        assert p[0] == 512 and p[1] == 0

        src = tmp_path / "before"
        src.mkdir()
        # same physical box seen in two overlapping tiles: tile at
        # x=0 sees it at (500..520), tile at x=512 sees it at (-12..8)
        lines = [
            "P0001__1.0__0___0 0.9 500 100 520 100 520 110 500 110\n",
            "P0001__1.0__512___0 0.8 -12 100 8 100 8 110 -12 110\n",
            # a distinct far-away box
            "P0001__1.0__0___0 0.7 10 10 30 10 30 20 10 20\n",
            # half-scale tile: coords divide by rate -> x2
            "P0002__0.5__0___0 0.6 50 50 60 50 60 55 50 55\n",
        ]
        (src / "Ship.txt").write_text("".join(lines))
        dst = tmp_path / "after"
        mergebypoly(str(src), str(dst), num_process=1)
        out = (dst / "Ship.txt").read_text().strip().split("\n")
        p1 = [l for l in out if l.startswith("P0001")]
        p2 = [l for l in out if l.startswith("P0002")]
        # overlap pair collapsed to the higher-score one + the far box
        assert len(p1) == 2
        best = [l for l in p1 if " 0.9 " in l][0]
        assert best.split()[2] == "500.0"
        # rate-0.5 coords scaled back to original resolution
        vals = [float(v) for v in p2[0].split()[2:]]
        assert vals[0] == 100.0 and vals[1] == 100.0

    def test_flip_unflip(self):
        import numpy as np

        from rs_detection_tpu.data.devkits.data_merge import flip_box

        poly = np.array([10.0, 10, 30, 10, 30, 20, 10, 20])
        target = dict(flip_mode="H", ori_img_size=(100, 50))
        un = flip_box(poly.copy(), target)
        assert un[0] == 90.0 and un[1] == 10.0


class TestDraw:
    def test_draw_primitives_render(self):
        import matplotlib

        matplotlib.use("Agg")
        from rs_detection_tpu.utils.draw import (colors_val, draw_hbb,
                                                 draw_obb, draw_poly,
                                                 get_img_from_fig,
                                                 plt_init,
                                                 random_colors,
                                                 single_color_val)

        fig, ax = plt_init(96, 64)
        draw_hbb(ax, np.array([[5, 5, 40, 30]]), ["car 0.9"], "red")
        draw_obb(ax, np.array([[60, 30, 30, 12, 0.5]]), None,
                 (0, 255, 0))
        draw_poly(ax, np.array([[10, 40, 40, 40, 40, 60, 10, 60]]),
                  None, "#0000ff")
        img = get_img_from_fig(fig, 96, 64)
        assert img.shape == (64, 96, 3) and img.dtype == np.uint8
        # something non-white was drawn
        assert (img < 250).any()
        assert single_color_val("red") == (1.0, 0.0, 0.0)
        assert single_color_val((255, 0, 0)) == (1.0, 0.0, 0.0)
        assert len(colors_val(["red", "#00ff00"])) == 2
        assert len(random_colors(5)) == 5
