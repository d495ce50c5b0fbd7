"""Tracker tests: ByteTrack id persistence, DeepSORT lifecycle params."""

import numpy as np
import pytest

from manual_yolo_tpu.track.bytetrack import ByteTrack
from manual_yolo_tpu.track.deepsort import DeepSortTracker
from manual_yolo_tpu.track.kalman import (
    KalmanBoxFilter,
    cxcyah_to_xyxy,
    xyxy_to_cxcyah,
)


def _det(x1, y1, x2, y2, conf=0.9, cid=0):
    return {"x1": x1, "y1": y1, "x2": x2, "y2": y2, "conf": conf, "class_id": cid,
            "class_name": f"c{cid}"}


def test_kalman_roundtrip():
    kf = KalmanBoxFilter()
    box = np.array([10, 20, 50, 80], float)
    mean, cov = kf.initiate(xyxy_to_cxcyah(box))
    np.testing.assert_allclose(cxcyah_to_xyxy(mean), box, atol=1e-6)
    mean, cov = kf.predict(mean, cov)
    mean, cov = kf.update(mean, cov, xyxy_to_cxcyah(box))
    np.testing.assert_allclose(cxcyah_to_xyxy(mean), box, atol=1.0)


def test_bytetrack_persistent_ids():
    tr = ByteTrack()
    out1 = tr.update([_det(10, 10, 50, 50), _det(200, 200, 260, 280)])
    ids1 = sorted(d["tracker_id"] for d in out1)
    assert ids1 == [1, 2]
    # move boxes slightly -> same ids
    out2 = tr.update([_det(12, 11, 52, 51), _det(203, 202, 263, 282)])
    assert {d["tracker_id"] for d in out2} == {1, 2}
    # id follows the object, not the order
    out3 = tr.update([_det(205, 204, 265, 284), _det(14, 12, 54, 52)])
    by_pos = {d["x1"]: d["tracker_id"] for d in out3}
    assert by_pos[14] == out2[0]["tracker_id"]
    assert by_pos[205] == out2[1]["tracker_id"]


def test_bytetrack_low_conf_second_stage():
    tr = ByteTrack()
    out1 = tr.update([_det(10, 10, 50, 50, conf=0.9)])
    tid = out1[0]["tracker_id"]
    # drop to low confidence: still matched to the same track in stage 2
    out2 = tr.update([_det(11, 11, 51, 51, conf=0.2)])
    assert out2[0]["tracker_id"] == tid
    # but a NEW low-conf detection does not create a track
    out3 = tr.update([_det(400, 400, 450, 450, conf=0.2), _det(12, 12, 52, 52, conf=0.9)])
    new = [d for d in out3 if d["x1"] == 400][0]
    assert new["tracker_id"] == -1


def test_bytetrack_lost_track_recovery():
    tr = ByteTrack(lost_track_buffer=5)
    out1 = tr.update([_det(10, 10, 50, 50)])
    tid = out1[0]["tracker_id"]
    for _ in range(3):  # disappear for 3 frames
        tr.update([])
    out2 = tr.update([_det(10, 10, 50, 50)])
    assert out2[0]["tracker_id"] == tid
    # beyond the buffer the id is gone
    for _ in range(10):
        tr.update([])
    out3 = tr.update([_det(10, 10, 50, 50)])
    assert out3[0]["tracker_id"] != tid


def test_deepsort_confirm_and_age():
    tr = DeepSortTracker(max_age=2, n_init=1)
    tracks = tr.update_tracks([([10, 10, 50, 50], 0.9, "button_fold")])
    assert len(tracks) == 1 and tracks[0].det_class == "button_fold"
    tid = tracks[0].track_id
    t2 = tr.update_tracks([([12, 11, 52, 51], 0.8, "button_fold")])
    assert t2[0].track_id == tid
    # miss > max_age frames -> dropped
    for _ in range(4):
        tr.update_tracks([])
    t3 = tr.update_tracks([([10, 10, 50, 50], 0.9, "button_fold")])
    assert t3[0].track_id != tid


def test_deepsort_class_votes_surface():
    """Track carries det_class so pipe-level majority voting can work."""
    tr = DeepSortTracker()
    tr.update_tracks([([0, 0, 20, 20], 0.9, "button_call")])
    t = tr.update_tracks([([1, 1, 21, 21], 0.9, "button_check")])
    assert t[0].det_class == "button_check"
    assert callable(t[0].to_ltrb)
    assert t[0].is_confirmed()


def test_deepsort_appearance_resolves_iou_ambiguity():
    """An ambiguous re-detection that IoU alone assigns to the WRONG track is
    recovered by the appearance embedder (the reference's deep-sort-realtime
    embeds by default, pipe.py:161-162)."""
    import numpy as np

    from manual_yolo_tpu.runtime.embedder import default_embedder
    from manual_yolo_tpu.track.deepsort import DeepSortTracker

    emb = default_embedder("weights/rank_classifier_scratch.npz")
    assert emb is not None

    rng = np.random.default_rng(0)
    tex_a = rng.integers(0, 255, (40, 40, 3), np.uint8)  # noise texture
    tex_b = np.zeros((40, 40, 3), np.uint8)
    tex_b[..., 2] = 255  # flat red

    box_a = [10, 10, 50, 50]
    box_b = [10, 60, 50, 100]
    # ambiguous position: IoU 0.11 with A's track, 0.38 with B's track
    box_amb = [10, 42, 50, 82]

    def frame(placements):
        f = np.full((200, 200, 3), 32, np.uint8)
        for (x1, y1, x2, y2), tex in placements:
            f[y1:y2, x1:x2] = tex
        return f

    def run(tracker, use_frame):
        id_a = id_b = None
        for _ in range(3):
            f = frame([(box_a, tex_a), (box_b, tex_b)])
            tracks = tracker.update_tracks(
                [(box_a, 0.9, "a"), (box_b, 0.9, "b")],
                frame=f if use_frame else None,
            )
            pos = {tuple(np.round(t.to_ltrb()).astype(int)): t.track_id
                   for t in tracks}
            id_a = pos.get(tuple(box_a), id_a)
            id_b = pos.get(tuple(box_b), id_b)
        # object A re-appears at the ambiguous position; B is occluded
        f = frame([(box_amb, tex_a)])
        tracks = tracker.update_tracks(
            [(box_amb, 0.9, "a")], frame=f if use_frame else None
        )
        assert len(tracks) == 1
        return tracks[0].track_id, id_a, id_b

    # IoU-only: the ambiguous detection steals B's identity
    got, id_a, id_b = run(DeepSortTracker(), use_frame=False)
    assert got == id_b
    # appearance: identity follows the texture, not the nearest box
    got, id_a, id_b = run(DeepSortTracker(embedder=emb), use_frame=True)
    assert got == id_a


def test_reid_embedder_beats_classifier_features_on_same_class_pairs():
    """A/B: the purpose-trained re-id embedder (train/embedder.py, NT-Xent
    over tracker-realistic views) must separate same-class instance pairs
    (two villain name plates, two stacks — DeepSORT's hard case,
    reference pipe.py:48-51) better than the round-1/2 stand-in
    (rank-classifier backbone features)."""
    import os

    from manual_yolo_tpu.runtime.embedder import AppearanceEmbedder
    from manual_yolo_tpu.train.embedder import (
        extract_instances,
        sample_views,
        verification_auc,
    )
    from manual_yolo_tpu.train.data import load_yolo_split

    reid_w = "weights/reid_embedder.npz"
    fallback_w = "weights/rank_classifier_scratch.npz"
    data_root = "/root/reference/roadmap1.v3i.yolov8"
    if not (os.path.exists(reid_w) and os.path.isdir(data_root)):
        pytest.skip("re-id weights or reference dataset not available")

    samples = load_yolo_split(data_root, "valid")[:6]
    windows, classes = extract_instances(samples, imgsz=64)

    def auc(weights_path):
        emb = AppearanceEmbedder.from_npz(weights_path)

        def fn(views):
            # views are float RGB [0,1]; AppearanceEmbedder takes BGR u8
            crops = [
                (v[..., ::-1] * 255).astype(np.uint8) for v in views
            ]
            return emb(crops)

        return verification_auc(
            fn, windows, classes, 64, np.random.default_rng(7)
        )

    m_reid = auc(reid_w)
    m_fall = auc(fallback_w)
    assert m_reid["auc_same_class"] > m_fall["auc_same_class"], (
        f"re-id {m_reid} not better than fallback {m_fall}"
    )
    assert m_reid["auc_all"] > 0.9
