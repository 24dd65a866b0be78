"""Round-4 goldens: video frame-sampling stats and audio clip stats — the
oracles for the two media ``queries()`` entries (pipelines/media.py).

Provenance contract (same as make_goldens{,_r3..r10}.py): the golden is
computed by an INDEPENDENT decomposition at the driver's correctness scale
(sf0.01), cross-checked against the engine before being written, committed
under goldens/sf0.01/.

- video_frame_stats: the engine samples frames through the VID0 container
  (FrameSampler actor: length-prefix seeks, per-frame raw-container decode,
  keyed bucketed reduce with a lexsort+reduceat kernel). The golden never
  touches a container or a Dataset: it regenerates each video's ORIGINAL
  pixel arrays from the id, derives the sampled index set from the stride
  rule directly, and counts distinct hashes with Python sets. The pixel
  hash itself (codecs.phash64) is shared with the engine — the golden
  independently validates sampling, container round-trip (raw frames are
  lossless, so decoded == original), id plumbing, and the distributed
  reduce.
- audio_clip_stats: the engine decodes AUD0 via struct/frombuffer and
  reduces with vectorized numpy int64. The golden computes the same exact
  integers with pure-Python big-int accumulation over the regenerated
  sample streams — no numpy in the reduction, so overflow/accumulation
  behavior is independently pinned.

Regenerate with:
    PYTHONPATH=/root/repo python tools/make_goldens_r11.py
"""

from __future__ import annotations

import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from cninfo_crawler_ray.functions import codecs  # noqa: E402
from cninfo_crawler_ray.pipelines import media  # noqa: E402

GOLDEN_DIR = "/root/repo/goldens/sf0.01"
SF_DIR = "/root/testdata/sf0.01"


def golden_video(stride: int = 2) -> pd.DataFrame:
    rows = []
    for vid in range(media.n_videos_for(SF_DIR)):
        n_frames, fps = media.video_spec(vid)
        want = sorted(set(range(0, n_frames, stride)) | {n_frames - 1})
        hashes = {codecs.phash64(media.video_frame_pixels(vid, i))
                  for i in want}
        rows.append({"video_id": vid,
                     "fps_milli": int(round(fps * 1000)),
                     "n_sampled": len(want),
                     "n_distinct_phash": len(hashes)})
    return pd.DataFrame(rows).astype("int64")


def golden_audio() -> pd.DataFrame:
    rows = []
    for cid in range(media.n_clips_for(SF_DIR)):
        n, rate = media.audio_spec(cid)
        pcm = [int(v) for v in media.audio_samples(cid)]  # pure-Python ints
        assert len(pcm) == n
        sum_sq = 0
        n_zc = 0
        for i, v in enumerate(pcm):
            sum_sq += v * v
            if i and (v < 0) != (pcm[i - 1] < 0):
                n_zc += 1
        rows.append({"clip_id": cid, "sample_rate": rate,
                     "duration_ms": n * 1000 // rate,
                     "sum_sq": sum_sq, "n_zero_cross": n_zc})
    return pd.DataFrame(rows).astype("int64")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    gv = golden_video()
    ev = media.q_video_frame_stats(SF_DIR)
    pd.testing.assert_frame_equal(
        ev.reset_index(drop=True),
        gv[list(ev.columns)].reset_index(drop=True))
    pq.write_table(pa.Table.from_pandas(gv, preserve_index=False)
                   .replace_schema_metadata(None),
                   f"{GOLDEN_DIR}/video_frame_stats.parquet")
    print(f"video_frame_stats: {len(gv)} rows, engine cross-check OK")

    ga = golden_audio()
    ea = media.q_audio_clip_stats(SF_DIR)
    pd.testing.assert_frame_equal(
        ea.reset_index(drop=True),
        ga[list(ea.columns)].reset_index(drop=True))
    pq.write_table(pa.Table.from_pandas(ga, preserve_index=False)
                   .replace_schema_metadata(None),
                   f"{GOLDEN_DIR}/audio_clip_stats.parquet")
    print(f"audio_clip_stats: {len(ga)} rows, engine cross-check OK")

    ray.shutdown()


if __name__ == "__main__":
    main()
