"""Video/audio media queries (pipelines/media.py): deterministic corpus
synthesis + end-to-end query semantics vs independent recomputation at
smoke scale (the sf0.01 golden parity is covered by the oracle gate)."""

import numpy as np

from cninfo_crawler_ray.functions import codecs
from cninfo_crawler_ray.pipelines import media
from cninfo_crawler_ray.stages import multimodal as M


def test_media_synthesis_deterministic():
    assert media.make_video_payload(7) == media.make_video_payload(7)
    assert media.make_audio_payload(7) == media.make_audio_payload(7)
    # held frame rule: every third frame repeats its predecessor
    assert np.array_equal(media.video_frame_pixels(3, 2),
                          media.video_frame_pixels(3, 1))
    assert not np.array_equal(media.video_frame_pixels(3, 1),
                              media.video_frame_pixels(3, 0))


def test_video_payload_roundtrip_lossless():
    vid = 11
    n_frames, fps = media.video_spec(vid)
    frames, got_fps, got_n = M.decode_video(media.make_video_payload(vid))
    assert got_n == n_frames and got_fps == fps
    for i, f in enumerate(frames):
        assert np.array_equal(f, media.video_frame_pixels(vid, i))


def test_video_frame_stats_matches_direct(ray_session):
    out = media.q_video_frame_stats("/root/testdata/sf0.001", stride=2)
    assert len(out) == media.n_videos_for("/root/testdata/sf0.001")
    assert list(out["video_id"]) == sorted(out["video_id"])
    for _, row in out.head(8).iterrows():
        vid = int(row["video_id"])
        n_frames, fps = media.video_spec(vid)
        want = sorted(set(range(0, n_frames, 2)) | {n_frames - 1})
        hashes = {codecs.phash64(media.video_frame_pixels(vid, i))
                  for i in want}
        assert row["fps_milli"] == int(round(fps * 1000))
        assert row["n_sampled"] == len(want)
        assert row["n_distinct_phash"] == len(hashes)
        # the held-frame rule must actually bite somewhere
    assert (out["n_distinct_phash"] < out["n_sampled"]).any()


def test_audio_clip_stats_matches_direct(ray_session):
    out = media.q_audio_clip_stats("/root/testdata/sf0.001")
    assert len(out) == media.n_clips_for("/root/testdata/sf0.001")
    for _, row in out.head(8).iterrows():
        cid = int(row["clip_id"])
        n, rate = media.audio_spec(cid)
        x = media.audio_samples(cid).astype(np.int64)
        assert row["sample_rate"] == rate
        assert row["duration_ms"] == n * 1000 // rate
        assert row["sum_sq"] == int((x * x).sum())
        assert row["n_zero_cross"] == int(((x[1:] < 0) != (x[:-1] < 0)).sum())
