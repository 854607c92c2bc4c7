"""Golden parity vs the built C++ reference binary (when available).

The reference binary is built out-of-tree from /root/reference with system
OpenCV/TBB (see tools/build_reference.sh).  These tests run both
implementations on the same synthetic recording and require the per-event
flow to agree closely and the compensated time image to meet the PSNR gate
(BASELINE.md).  Skipped when the binary isn't present.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF_BIN = os.environ.get("BF_REFERENCE_BIN", "/tmp/refbuild/build/bf_motion_compensator")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BIN), reason="reference binary not built"
)


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    from better_flow_tpu.io.event_file import write_events
    from better_flow_tpu.io.synthetic import synthetic_events

    tmp = tmp_path_factory.mktemp("golden")
    d = synthetic_events(
        60_000, duration_s=0.4, res_x=180, res_y=240,
        vx=60.0, vy=-40.0, rot=0.1, div=0.03, n_points=400, seed=21,
    )
    rec = str(tmp / "rec.txt")
    write_events(rec, d["x"], d["y"], d["t_ns"], d["polarity"])
    ref_out = str(tmp / "ref.txt")
    subprocess.run(
        [REF_BIN, rec, "-o", ref_out],
        check=True, capture_output=True, timeout=600,
    )
    return {"rec": rec, "ref_out": ref_out, "events": d}


def test_flow_matches_reference(golden):
    from better_flow_tpu.config import PipelineConfig
    from better_flow_tpu.io.event_file import read_events, read_events_uv
    from better_flow_tpu.runtime.scan_pipeline import compensate_recording_scan

    rec = read_events(golden["rec"])
    ref = read_events_uv(golden["ref_out"])
    assert len(ref["x"]) == len(rec["x"])

    out = compensate_recording_scan(rec["x"], rec["y"], rec["t_ns"], PipelineConfig())
    ok = ~out["noise"]
    du = np.abs(out["u"][ok] - ref["u"][ok])
    dv = np.abs(out["v"][ok] - ref["v"][ok])
    speed = np.hypot(ref["u"][ok], ref["v"][ok]).mean()
    assert np.median(du) < 0.02 * speed, (np.median(du), speed)
    assert np.median(dv) < 0.02 * speed
    assert np.corrcoef(out["u"][ok], ref["u"][ok])[0, 1] > 0.98
    assert np.corrcoef(out["v"][ok], ref["v"][ok])[0, 1] > 0.98


def test_compensated_image_psnr(golden):
    """Compensated count images from both flows must agree (PSNR gate) and
    both must be sharper than the uncompensated image."""
    from better_flow_tpu.config import PipelineConfig
    from better_flow_tpu.eval.metrics import psnr
    from better_flow_tpu.io.event_file import read_events, read_events_uv
    from better_flow_tpu.runtime.scan_pipeline import compensate_recording_scan
    from better_flow_tpu.viz.images import projection_img

    rec = read_events(golden["rec"])
    ref = read_events_uv(golden["ref_out"])
    out = compensate_recording_scan(rec["x"], rec["y"], rec["t_ns"], PipelineConfig())

    # Warp both flows' events back to slice start via pr = fr - u * t.
    t_s = rec["t_ns"] / 1e9
    t_s = t_s - t_s.min()

    def comp_img(u, v):
        return projection_img(
            rec["x"] - u * t_s, rec["y"] - v * t_s, scale=3,
        )

    img_ref = comp_img(ref["u"], ref["v"])
    img_ours = comp_img(out["u"], out["v"])
    img_raw = projection_img(rec["x"], rec["y"], scale=3)

    p = psnr(img_ours.astype(float), img_ref.astype(float), peak=255.0)
    assert p > 25.0, f"PSNR vs reference compensated image too low: {p}"

    occ_ref = (img_ref > 0).sum()
    occ_ours = (img_ours > 0).sum()
    occ_raw = (img_raw > 0).sum()
    assert occ_ours < occ_raw          # we deblur
    assert occ_ours <= occ_ref * 1.05  # at least as concentrated as the C++
