"""Dataset-layer tests on synthetic on-disk layouts (no network/ffmpeg):
VID JSON parsing + segment splitting + resize transform, EPIC-Kitchens CSV
clips, Kinetics-400 label parsing."""

import json

import numpy as np
import pytest

from PIL import Image


def _write_frames(directory, names, size=(24, 32)):
    directory.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for name in names:
        arr = rng.integers(0, 255, (size[0], size[1], 3), dtype=np.uint8)
        Image.fromarray(arr).save(directory / name)


class TestVID:
    def _layout(self, tmp_path):
        base = tmp_path / "vid"
        frames = base / "vid_val" / "frames" / "0000"
        # Frames 0,1,2 then a gap then 5,6: two segments.
        _write_frames(frames, [f"{i:06d}.jpg" for i in (0, 1, 2, 5, 6)])
        images = [
            {"id": i, "file_name": f"VID_val_0000_{i:06d}.JPEG", "width": 32, "height": 24}
            for i in (0, 1, 2, 5, 6)
        ]
        annotations = [
            {"id": 0, "image_id": 0, "category_id": 3, "bbox": [2, 4, 10, 8]},
            {"id": 1, "image_id": 5, "category_id": 1, "bbox": [1, 1, 5, 5]},
        ]
        (base / "vid_val").mkdir(parents=True, exist_ok=True)
        with open(base / "vid_val" / "labels.json", "w") as f:
            json.dump({"images": images, "annotations": annotations}, f)
        (base / "unpacked").touch()
        return base

    def test_segments_and_annotations(self, tmp_path):
        from eventful_transformer_tpu.data.vid import VID

        data = VID(self._layout(tmp_path), split="vid_val", shuffle=False)
        assert len(data) == 2  # non-contiguous frames split into segments
        seg0 = data[0]
        assert len(seg0) == 3
        frame, ann = seg0[0]
        assert frame.shape == (3, 24, 32)
        # xywh -> xyxy, 1-based -> 0-based labels
        np.testing.assert_allclose(ann["boxes"], [[2, 4, 12, 12]])
        assert ann["labels"].tolist() == [2]
        seg1 = data[1]
        assert len(seg1) == 2
        _, ann1 = seg1[0]
        assert ann1["labels"].tolist() == [0]

    def test_resize_transform_scales_boxes(self, tmp_path):
        from eventful_transformer_tpu.data.vid import VID, VIDResize

        data = VID(
            self._layout(tmp_path),
            split="vid_val",
            shuffle=False,
            combined_transform=VIDResize(short_edge_length=48, max_size=64),
        )
        frame, ann = data[0][0]
        # scale = min(48/24, 64/32) = 2
        assert frame.shape[-2:] == (48, 64)
        np.testing.assert_allclose(ann["boxes"], [[4, 8, 24, 24]])


class TestEPICKitchens:
    def test_clip_parsing(self, tmp_path):
        from eventful_transformer_tpu.data.epic_kitchens import EPICKitchens

        base = tmp_path / "epic"
        (base / "validation").mkdir(parents=True)
        header = (
            "narration_id,participant_id,video_id,narration_timestamp,"
            "start_timestamp,stop_timestamp,start_frame,stop_frame,"
            "narration,verb,verb_class,noun,noun_class\n"
        )
        rows = [
            "P01_01_0,P01,P01_01,a,00:00:00.00,00:00:01.00,0,10,open door,open,2,door,3\n",
            "P01_01_1,P01,P01_01,a,00:00:01.00,00:00:02.00,10,20,close door,close,7,door,3\n",
        ]
        (base / "EPIC_100_validation.csv").write_text(header + "".join(rows))
        for clip in range(2):
            _write_frames(base / "validation" / "frames" / f"{clip:05d}",
                          [f"{t:04d}.jpg" for t in range(1, 4)])
        (base / "validation" / "decoded").touch()
        data = EPICKitchens(base, split="validation", shuffle=False)
        assert len(data) == 2
        video, label = data[0]
        assert video.shape == (3, 3, 24, 32)
        assert label == 2
        assert data[1][1] == 7


class TestKinetics400:
    def test_label_parsing(self, tmp_path):
        from eventful_transformer_tpu.data.kinetics400 import Kinetics400

        base = tmp_path / "k400" / "val"
        frames = base / "frames_224_25"
        (base).mkdir(parents=True)
        (base / "labels.csv").write_text(
            "label,youtube_id,time_start,time_end,split\n"
            "zumba,abc,0,10,val\n"
            "abseiling,xyz,5,15,val\n"
        )
        for vid in ("abc_000000_000010", "xyz_000005_000015"):
            _write_frames(frames / vid, ["001.jpg", "002.jpg"])
        for stage in ("downloaded", "unpacked", "decoded_224_25"):
            (base / stage).touch()
        data = Kinetics400(tmp_path / "k400", split="val", decode_size=224,
                           decode_fps=25, shuffle=False)
        assert len(data) == 2
        video, label = data[0]
        assert video.shape == (2, 3, 24, 32)
        # alphabetical class ids: abseiling=0, zumba=1
        assert label == 1  # sorted by video_id: abc... is zumba
        assert data[1][1] == 0
