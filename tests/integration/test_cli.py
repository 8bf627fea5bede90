"""CLI-level regression tests (mains invoked in-process, tiny models, CPU)."""

import json
import os

import cv2
import numpy as np
import pytest


@pytest.fixture
def image_dir(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, (90, 120, 3)).astype(np.uint8)
        cv2.imwrite(str(d / f"img{i}.jpg"), img)
    return str(d)


def test_detect_cli_images(image_dir, tmp_path):
    from viddet_tpu.cli.detect import main

    out = str(tmp_path / "out")
    main([
        "--network", "yolo3_tiny_darknet", "--dataset", "voc",
        "--input", image_dir, "--output", out,
        "--data-shape", "64", "--batch-size", "2",
        "--thresh", "0.0", "--save-detections",
    ])
    files = sorted(os.listdir(out))
    assert "img0_det.jpg" in files
    assert "img0.txt" in files
    # det txt format: "<class> <score> <x1> <y1> <x2> <y2>"
    with open(os.path.join(out, "img0.txt")) as f:
        for line in f:
            parts = line.split()
            assert len(parts) == 6
            float(parts[1])
            break


def test_detect_cli_quant_int8(image_dir, tmp_path):
    """--quant int8 with explicit --calib-images: calibrated quantized
    detection end-to-end (same output contract as the float path)."""
    from viddet_tpu.cli.detect import main

    out = str(tmp_path / "out_q")
    main([
        "--network", "yolo3_tiny_darknet", "--dataset", "voc",
        "--input", image_dir, "--output", out,
        "--data-shape", "64", "--batch-size", "2",
        "--thresh", "0.0", "--save-detections", "--no-draw",
        "--quant", "int8", "--calib-images", image_dir,
        "--calib-batches", "1",
    ])
    assert "img0.txt" in sorted(os.listdir(out))


def test_dump_config_and_config_file(tmp_path, capsys):
    from viddet_tpu.cli.train_yolov3 import parse_args

    with pytest.raises(SystemExit):
        parse_args(["--data-root", "synthetic", "--dump-config"])
    dumped = json.loads(capsys.readouterr().out)
    assert dumped["batch_size"] == 64

    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"batch_size": 7, "epochs": 2}))
    args = parse_args(["--data-root", "synthetic", "--config", str(cfg)])
    assert args.batch_size == 7 and args.epochs == 2
    # explicit flag wins over config value
    args = parse_args(
        ["--data-root", "synthetic", "--config", str(cfg), "--batch-size", "9"]
    )
    assert args.batch_size == 9

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"nonexistent_flag": 1}))
    with pytest.raises(SystemExit):
        parse_args(["--data-root", "synthetic", "--config", str(bad)])


def test_visualise_cli_dataset(tmp_path):
    from viddet_tpu.cli.visualise import main

    out = str(tmp_path / "vis")
    main([
        "--dataset", "synthetic", "--data-root", "synthetic",
        "--output", out, "--max-images", "2", "--gif", "anim.gif",
    ])
    files = os.listdir(out)
    assert len([f for f in files if f.endswith("_vis.jpg")]) == 2
    from PIL import Image

    with Image.open(os.path.join(out, "anim.gif")) as gif:
        assert gif.is_animated and gif.n_frames == 2


def test_evaluate_cli_synthetic(tmp_path, caplog):
    from viddet_tpu.cli.evaluate import main

    main([
        "--network", "yolo3_tiny_darknet", "--dataset", "synthetic",
        "--data-root", "synthetic", "--data-shape", "64",
        "--batch-size", "4", "--max-images", "8", "--num-workers", "0",
    ])
    # random weights -> mAP near 0, but the full pipeline must run
    assert any("mAP" in r.message for r in caplog.records)


def test_evaluate_cli_quant_int8(tmp_path, caplog):
    """--quant int8 end-to-end: calibration pass + quantized eval run."""
    from viddet_tpu.cli.evaluate import main

    main([
        "--network", "yolo3_tiny_darknet", "--dataset", "synthetic",
        "--data-root", "synthetic", "--data-shape", "64",
        "--batch-size", "4", "--max-images", "4", "--num-workers", "0",
        "--quant", "int8", "--calib-batches", "1",
    ])
    assert any("int8 calibration" in r.message for r in caplog.records)
    assert any("mAP" in r.message for r in caplog.records)


def make_vid_fixture(root):
    import xml.etree.ElementTree as ET

    snip = "snipA"
    ann = os.path.join(root, "Annotations", "VID", "val", snip)
    data = os.path.join(root, "Data", "VID", "val", snip)
    os.makedirs(ann)
    os.makedirs(data)
    img = np.zeros((60, 80, 3), np.uint8)
    for t in range(4):
        xml_root = ET.Element("annotation")
        obj = ET.SubElement(xml_root, "object")
        ET.SubElement(obj, "name").text = "n02958343"
        ET.SubElement(obj, "trackid").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        for tag, v in zip(("xmin", "ymin", "xmax", "ymax"), (5 + t, 10, 35 + t, 40)):
            ET.SubElement(bb, tag).text = str(v)
        with open(os.path.join(ann, f"{t:06d}.xml"), "w") as f:
            f.write(ET.tostring(xml_root).decode())
        cv2.imwrite(os.path.join(data, f"{t:06d}.JPEG"), img)


def test_evaluate_cli_vid_motion_iou(tmp_path, caplog):
    """evaluate CLI end-to-end on a VID fixture: motion-IoU table comes out."""
    from viddet_tpu.cli.evaluate import main

    root = str(tmp_path / "vidroot")
    make_vid_fixture(root)
    main([
        "--network", "yolo3_tiny_darknet", "--dataset", "vid",
        "--data-root", root, "--data-shape", "64",
        "--batch-size", "2", "--num-workers", "0",
    ])
    messages = " ".join(r.getMessage() for r in caplog.records)
    for mode in ("mAP(slow)", "mAP(medium)", "mAP(fast)"):
        assert mode in messages


def test_evaluate_save_and_rescore_detections(tmp_path, caplog):
    """--save-detections then --from-detections must reproduce the exact
    metric values without running the model (SURVEY.md §4.2: the reference
    evaluate.py writes/reads detection files)."""
    from viddet_tpu.cli.evaluate import main

    dets = str(tmp_path / "dets.jsonl")
    base = [
        "--network", "yolo3_tiny_darknet", "--dataset", "synthetic",
        "--data-root", "synthetic", "--data-shape", "64",
        "--batch-size", "4", "--max-images", "8", "--num-workers", "0",
    ]

    def map_lines():
        return [r.message for r in caplog.records if "mAP" in r.message]

    main(base + ["--save-detections", dets])
    first = map_lines()[-1]
    assert sum(1 for _ in open(dets)) == 8
    caplog.clear()
    main(base + ["--from-detections", dets])
    assert map_lines()[-1] == first


def test_evaluate_cli_sharded_matches_unsharded(tmp_path, caplog, monkeypatch):
    """Strided eval shards cover every image exactly once and the merged
    detections rescore to the unsharded metric (multi-host eval path,
    VERDICT r4 item 4).  VIDDET_EVAL_SHARD forces the shard in-process;
    16 images over 3 shards -> 6/5/5 with padded tail batches."""
    from viddet_tpu.cli.evaluate import main

    base = [
        "--network", "yolo3_tiny_darknet", "--dataset", "synthetic",
        "--data-root", "synthetic", "--data-shape", "64",
        "--batch-size", "4", "--num-workers", "0",
    ]

    def map_lines():
        return [r.message for r in caplog.records if "mAP" in r.message]

    full = str(tmp_path / "full.jsonl")
    main(base + ["--save-detections", full])
    unsharded_map = map_lines()[-1]

    shard_lines = []
    for i in range(3):
        monkeypatch.setenv("VIDDET_EVAL_SHARD", f"{i},3")
        p = str(tmp_path / f"shard{i}.jsonl")
        main(base + ["--save-detections", p])
        shard_lines.extend(open(p).read().splitlines())
    monkeypatch.delenv("VIDDET_EVAL_SHARD")

    full_lines = open(full).read().splitlines()
    assert len(shard_lines) == len(full_lines) == 16
    assert sorted(shard_lines) == sorted(full_lines)  # exact, incl. scores

    merged = str(tmp_path / "merged.jsonl")
    with open(merged, "w") as f:
        f.write("\n".join(shard_lines) + "\n")
    caplog.clear()
    main(base + ["--from-detections", merged])
    assert map_lines()[-1] == unsharded_map


def test_evaluate_cli_combined_dataset(tmp_path, caplog):
    """'--dataset synthetic+synthetic' exercises the CombinedDetection CLI
    wiring (reference datasets/combined.py, SURVEY.md §3.1 item 5)."""
    from viddet_tpu.cli.evaluate import main

    main([
        "--network", "yolo3_tiny_darknet", "--dataset", "synthetic+synthetic",
        "--data-root", "synthetic", "--data-shape", "64",
        "--batch-size", "4", "--max-images", "8", "--num-workers", "0",
    ])
    assert any("mAP" in r.message for r in caplog.records)


@pytest.mark.slow
def test_train_cli_temporal_on_combined_still_dataset(tmp_path, caplog):
    """Temporal k-frame training over a combined dataset whose members are
    still images: stills are tiled into static clips (reference DET+VID
    temporal semantics, SURVEY.md §4.5).

    slow: compiles a k-frame temporal train step in-process (~34s on 1
    CPU core).  Fast-suite temporal coverage: the gradient-flow unit test,
    the temporal multistream/detect/evaluate CLI tests; fast-suite
    combined-dataset coverage: the combined evaluate CLI test."""
    from viddet_tpu.cli.train_yolov3 import main

    main([
        "--network", "yolo3_tiny_darknet",
        "--dataset", "synthetic+synthetic", "--data-root", "synthetic",
        "--temporal-k", "3", "--temporal-agg", "max",
        "--batch-size", "8", "--max-steps", "2", "--num-workers", "0",
        "--data-shape", "64", "--no-random-shape",
        "--save-prefix", str(tmp_path / "tcomb"),
    ])
    assert any("reached max-steps" in r.getMessage() for r in caplog.records)


def test_evaluate_cli_temporal_on_combined_still_dataset(caplog):
    from viddet_tpu.cli.evaluate import main

    main([
        "--network", "yolo3_tiny_darknet",
        "--dataset", "synthetic+synthetic", "--data-root", "synthetic",
        "--temporal-k", "3", "--temporal-agg", "max",
        "--data-shape", "64", "--batch-size", "2", "--max-images", "4",
        "--num-workers", "0",
    ])
    assert any("mAP" in r.message for r in caplog.records)


@pytest.mark.slow
def test_train_cli_from_packed_shards(tmp_path, caplog):
    """'--dataset packed --data-root <prefix>' trains from .vdtp shards
    (the RecordIO-equivalent fast path, SURVEY.md §3.2 N12).

    slow: a full train-CLI run over .vdtp shards (~24s on 1 CPU core,
    compile-bound).  Fast-suite packed coverage: test_packed.py round-trip
    units + the packed DetectionLoader test."""
    import cv2

    from viddet_tpu.data.packed import pack_dataset
    from viddet_tpu.cli.train_yolov3 import main

    class _Disk:
        classes = ("a", "b")
        wn_classes = ("n1", "n2")

        def __len__(self):
            return 16

        def image_path(self, i):
            return str(tmp_path / f"{i}.jpg")

        def label(self, i):
            return np.array([[2.0, 2.0, 30.0, 30.0, i % 2, 0.0]], np.float32)

    rng = np.random.default_rng(0)
    for i in range(16):
        cv2.imwrite(str(tmp_path / f"{i}.jpg"),
                    rng.integers(0, 255, (48, 64, 3)).astype(np.uint8))
    pack_dataset(_Disk(), str(tmp_path / "pk"), shard_size=8)

    main([
        "--network", "yolo3_tiny_darknet",
        "--dataset", "packed", "--data-root", str(tmp_path / "pk"),
        "--batch-size", "8", "--max-steps", "2", "--num-workers", "0",
        "--data-shape", "64", "--no-random-shape",
        "--save-prefix", str(tmp_path / "pkrun"),
    ])
    assert any("reached max-steps" in r.getMessage() for r in caplog.records)


def test_visualise_cli_side_by_side(tmp_path):
    """--side-by-side writes GT|detections comparison frames at 2x width
    (the reference's comparison-video mode)."""
    from viddet_tpu.cli.visualise import main

    base_out = str(tmp_path / "vis_base")
    main([
        "--dataset", "synthetic", "--data-root", "synthetic",
        "--output", base_out, "--max-images", "1",
    ])
    base = cv2.imread(os.path.join(base_out, "000000_vis.jpg"))

    out = str(tmp_path / "vis")
    main([
        "--dataset", "synthetic", "--data-root", "synthetic",
        "--output", out, "--max-images", "1", "--side-by-side",
    ])
    img = cv2.imread(os.path.join(out, "000000_vis.jpg"))
    assert img is not None and img.shape[1] == 2 * base.shape[1]
    assert img.shape[0] == base.shape[0]


def test_extract_frames_cli(tmp_path):
    """Pre-extraction CLI: video -> numbered frame jpgs, --every honored."""
    import cv2

    video = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for _ in range(10):
        vw.write(np.zeros((48, 64, 3), np.uint8))
    vw.release()

    out = str(tmp_path / "frames")
    from viddet_tpu.cli.extract_frames import main

    main(["--input", video, "--output", out, "--every", "2"])
    files = sorted(os.listdir(out))
    assert len(files) == 5
    assert files[0] == "00000000.jpg"


def test_evaluate_detections_bit_identical_across_runs(tmp_path, capsys):
    """Two independent evaluate runs (same seeded init, same data) must
    produce BYTE-identical detection files, and tools/compare_detections
    must certify them identical at zero tolerance — the process-level
    determinism contract behind the fixed-weight parity workflow
    (PARITY.md 'Known gaps')."""
    from tools.compare_detections import main as cmp_main
    from viddet_tpu.cli.evaluate import main

    base = [
        "--network", "yolo3_tiny_darknet", "--dataset", "synthetic",
        "--data-root", "synthetic", "--data-shape", "64",
        "--batch-size", "4", "--max-images", "8", "--num-workers", "2",
    ]
    a = str(tmp_path / "a.jsonl")
    b = str(tmp_path / "b.jsonl")
    main(base + ["--save-detections", a])
    main(base + ["--save-detections", b])
    assert open(a, "rb").read() == open(b, "rb").read()

    import json

    rc = cmp_main([a, b])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and summary["identical"], summary
