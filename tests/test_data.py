"""RealEstate10K dataset tests against synthetic .npz clips + pose files."""

import json
import os

import numpy as np
import pytest

from camc2v_tpu.data.realestate10k import (
    DataLoader,
    RealEstate10K,
    choose_frame_stride,
    parse_pose_lines,
    poses_from_camera_data,
    resize_center_crop,
    sample_context_indices,
)
from camc2v_tpu.data.video_io import VideoReader, write_video

N_FRAMES = 60
H_SRC, W_SRC = 360, 640


def _make_pose_line(i):
    # ts fx fy cx cy k1 k2 + 3x4 w2c (identity R, translation x=i*0.1)
    pose = np.hstack([np.eye(3), np.array([[i * 0.1], [0], [0]])]).reshape(-1)
    vals = [i * 1000, 0.9, 1.6, 0.5, 0.5, 0.0, 0.0] + pose.tolist()
    return " ".join(f"{v:.6f}" for v in vals)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("re10k")
    (root / "clips").mkdir()
    (root / "meta").mkdir()
    names = [f"vid{i}" for i in range(3)]
    rng = np.random.default_rng(0)
    for name in names:
        frames = rng.integers(0, 255, (N_FRAMES, H_SRC, W_SRC, 3), dtype=np.uint8)
        write_video(str(root / "clips" / f"{name}.npz"), frames, fps=30.0)
        with open(root / "meta" / f"{name}.txt", "w") as f:
            f.write("http://example.com/video\n")
            for i in range(N_FRAMES):
                f.write(_make_pose_line(i) + "\n")
    with open(root / "list.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    with open(root / "captions.json", "w") as f:
        json.dump({f"{n}.mp4": [f"a room {n}"] for n in names}, f)
    return root


def _dataset(root, **kw):
    args = dict(
        meta_path=str(root / "meta"),
        meta_list=str(root / "list.txt"),
        data_dir=str(root / "clips"),
        caption_file=str(root / "captions.json"),
        video_length=8,
        resolution=[64, 64],
        frame_stride=[1, 4],
        video_suffix=".npz",
        seed=0,
    )
    args.update(kw)
    return RealEstate10K(**args)


def test_pose_parsing():
    lines = [_make_pose_line(i) for i in range(5)]
    arr = parse_pose_lines(lines, [0, 2])
    intr, w2c = poses_from_camera_data(arr)
    assert w2c.shape == (2, 4, 4)
    np.testing.assert_allclose(w2c[1, 0, 3], 0.2, atol=1e-6)
    np.testing.assert_allclose(w2c[:, 3], [[0, 0, 0, 1]] * 2)
    np.testing.assert_allclose(intr[0], [0.9, 1.6, 0.5, 0.5])


def test_choose_frame_stride_shrinks():
    import random

    rng = random.Random(0)
    # 10 frames can't support stride 4 x 8 frames -> shrinks to fit
    stride, required = choose_frame_stride(4, 10, 8, rng)
    assert required <= 10 or stride == 1


def test_resize_center_crop_intrinsics():
    frames = np.zeros((2, 360, 640, 3), np.uint8)
    intr = np.tile(np.array([[0.9, 1.6, 0.5, 0.5]]), (2, 1))
    out, K = resize_center_crop(frames, 256, 256, intr)
    assert out.shape == (2, 256, 256, 3)
    # landscape: resized to h=256, w=455; fx = 0.9*455, cx = 0.5*256
    np.testing.assert_allclose(K[0, 0, 0], 0.9 * int(round(640 * 256 / 360)), rtol=1e-6)
    np.testing.assert_allclose(K[0, 1, 1], 1.6 * 256, rtol=1e-6)
    np.testing.assert_allclose(K[0, 0, 2], 128.0)
    np.testing.assert_allclose(K[0, 1, 2], 128.0)


def test_context_strategies():
    rng = np.random.default_rng(0)
    for strat in ["random_full", "random_outside", "random_back", "random_front"]:
        idx = sample_context_indices(strat, 2, (10, 30), 60, 4, rng)
        assert 0 < len(idx) <= 4
        if strat == "random_back":
            assert (idx >= 30).all()
        if strat == "random_front":
            assert (idx < 10).all()
        if strat == "random_outside":
            assert ((idx < 10) | (idx >= 30)).all()
    idx = sample_context_indices("last", 2, (10, 30), 60, 4, rng)
    np.testing.assert_array_equal(idx, [30])
    idx = sample_context_indices("furthest_distance", 2, (40, 50), 60, 4, rng)
    np.testing.assert_array_equal(idx, [0])  # front gap (40) > back gap (10)


def test_getitem_shapes(dataset_dir):
    ds = _dataset(dataset_dir)
    s = ds[0]
    assert s["video"].shape == (8, 64, 64, 3)
    assert s["video"].min() >= -1.0 and s["video"].max() <= 1.0
    assert s["RT"].shape == (8, 4, 4)
    assert s["camera_intrinsics"].shape == (8, 3, 3)
    assert s["caption"].startswith("a room")
    assert s["frame_stride"] >= 1


def test_getitem_with_context_frames(dataset_dir):
    ds = _dataset(dataset_dir, additional_cond_frames="random_back", num_additional_cond_frames=[1, 3])
    s = ds[0]
    assert s["cond_frames"].shape[1:] == (64, 64, 3)
    assert 1 <= s["cond_frames"].shape[0] <= 3
    assert s["RT_cond"].shape[0] == s["cond_frames"].shape[0]


def test_invalid_sample_resamples(dataset_dir):
    ds = _dataset(dataset_dir)
    # missing video file -> falls back to another sample
    ds.metadata.append("missing_vid")
    with open(os.path.join(str(dataset_dir / "meta"), "missing_vid.txt"), "w") as f:
        f.write("url\n" + _make_pose_line(0) + "\n")
    ds.captions["missing_vid.mp4"] = ["x"]
    s = ds[len(ds) - 1]
    assert s["video"].shape == (8, 64, 64, 3)


def test_dataloader_batch_consistent_context(dataset_dir):
    ds = _dataset(dataset_dir, additional_cond_frames="random_full", num_additional_cond_frames=[1, 4])
    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    batch = next(iter(dl))
    assert batch["video"].shape == (2, 8, 64, 64, 3)
    assert batch["cond_frames"].ndim == 5  # consistent N across the batch
    assert batch["RT_cond"].shape[1] == batch["cond_frames"].shape[1]
    assert isinstance(batch["caption"], list)


def test_tokenizer_hook(dataset_dir):
    tok = lambda s: np.arange(7)
    ds = _dataset(dataset_dir, tokenizer=tok)
    s = ds[0]
    np.testing.assert_array_equal(s["caption_tokens"], np.arange(7))


def test_prefetch_loader_yields_full_epoch(dataset_dir):
    """num_workers>0 pipelines plan->decode->finish; same batch count + shapes
    as the sync path (content order differs only via shuffling)."""
    ds = _dataset(dataset_dir, additional_cond_frames="random_full", num_additional_cond_frames=[1, 2])
    dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False, num_workers=2)
    batches = list(dl)
    assert len(batches) == len(dl)
    for b in batches:
        assert b["video"].shape[1:] == (8, 64, 64, 3)
        assert np.isfinite(b["video"]).all()
    dl.close()


@pytest.fixture(scope="module")
def mp4_dataset_dir(tmp_path_factory):
    """Real h264/mp4 fixtures so the native libav DecodePool path runs."""
    import cv2

    root = tmp_path_factory.mktemp("re10k_mp4")
    (root / "clips").mkdir()
    (root / "meta").mkdir()
    names = [f"vid{i}" for i in range(3)]
    rng = np.random.default_rng(0)
    for name in names:
        path = str(root / "clips" / f"{name}.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (W_SRC, H_SRC))
        assert vw.isOpened()
        for i in range(N_FRAMES):
            frame = rng.integers(0, 255, (H_SRC, W_SRC, 3), dtype=np.uint8)
            vw.write(frame)
        vw.release()
        with open(root / "meta" / f"{name}.txt", "w") as f:
            f.write("http://example.com/video\n")
            for i in range(N_FRAMES):
                f.write(_make_pose_line(i) + "\n")
    with open(root / "list.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    with open(root / "captions.json", "w") as f:
        json.dump({f"{n}.mp4": [f"a room {n}"] for n in names}, f)
    return root


def test_native_pool_prefetch_mp4(mp4_dataset_dir):
    """End-to-end: DecodePool-backed prefetch over real mp4 clips."""
    pytest.importorskip("camc2v_tpu.data._native_decode")
    import time

    ds = _dataset(mp4_dataset_dir, video_suffix=".mp4")
    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=False, num_workers=3)
    assert dl._pool is not None
    t0 = time.perf_counter()
    batches = list(dl)
    dt = time.perf_counter() - t0
    assert len(batches) == 2  # 3 clips, bs 2, keep last
    for b in batches:
        assert np.isfinite(b["video"]).all()
        assert b["video"].min() >= -1.0 and b["video"].max() <= 1.0
    print(f"prefetch mp4 epoch: {dt*1000:.1f} ms")
    dl.close()


def test_native_pool_scaled_decode(mp4_dataset_dir, tmp_path):
    """Pool decode with target_hw returns frames at the pre-crop resize dims
    of resize_center_crop (reference truncation formula), close to a cv2
    resize on smooth content (sws filtered bilinear vs cv2 bilinear differ
    strongly only on aliased/noise content)."""
    nd = pytest.importorskip("camc2v_tpu.data._native_decode")
    import cv2

    # smooth gradient clip: downscale filters must agree closely here
    path = str(tmp_path / "smooth.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (W_SRC, H_SRC))
    yy, xx = np.mgrid[0:H_SRC, 0:W_SRC]
    for i in range(8):
        frame = np.stack(
            [
                (xx * 255 // W_SRC),
                (yy * 255 // H_SRC),
                ((xx + yy + i * 10) * 255 // (H_SRC + W_SRC)) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        vw.write(frame)
    vw.release()

    H_t = W_t = 64
    if W_SRC / H_SRC > W_t / H_t:
        exp_h, exp_w = H_t, int(W_SRC * H_t / H_SRC)
    else:
        exp_h, exp_w = int(H_SRC * W_t / W_SRC), W_t

    pool = nd.DecodePool(1)
    try:
        t1 = pool.submit(path, [0, 3, 5], target_hw=(H_t, W_t))
        scaled = pool.fetch(t1, 3)
        t2 = pool.submit(path, [0, 3, 5])
        native = pool.fetch(t2, 3)
    finally:
        pool.close()

    assert scaled.shape == (3, exp_h, exp_w, 3)
    assert native.shape == (3, H_SRC, W_SRC, 3)
    ref = np.stack(
        [cv2.resize(f, (exp_w, exp_h), interpolation=cv2.INTER_LINEAR) for f in native]
    )
    diff = np.abs(scaled.astype(np.int16) - ref.astype(np.int16))
    assert float(diff.mean()) < 4.0, diff.mean()


def test_native_pool_concurrent_submit_fetch(mp4_dataset_dir):
    """Concurrency stress of the C++ pool: many in-flight tickets submitted
    from several Python threads, fetched OUT OF ORDER, each result exactly
    equal to a single-threaded reference decode of the same indices. Covers
    the pool's queue/ticket bookkeeping under real contention (VERDICT r4
    weak #7 — the multi-worker path on a 1-core dev box never races in the
    throughput tests)."""
    nd = pytest.importorskip("camc2v_tpu.data._native_decode")
    import threading

    clips = sorted((mp4_dataset_dir / "clips").glob("*.mp4"))
    jobs = []
    for rep in range(4):
        for ci, clip in enumerate(clips):
            idx = [(rep + ci) % N_FRAMES, (rep + ci + 3) % N_FRAMES, (rep * 2) % N_FRAMES]
            jobs.append((str(clip), sorted(set(idx))))

    ref_pool = nd.DecodePool(1)
    try:
        refs = []
        for path, idx in jobs:
            t = ref_pool.submit(path, idx)
            refs.append(ref_pool.fetch(t, len(idx)))
    finally:
        ref_pool.close()

    pool = nd.DecodePool(4)
    try:
        tickets = [None] * len(jobs)
        errs = []

        def submit_range(lo, hi):
            try:
                for j in range(lo, hi):
                    path, idx = jobs[j]
                    tickets[j] = pool.submit(path, idx)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [
            threading.Thread(target=submit_range, args=(lo, min(lo + 3, len(jobs))))
            for lo in range(0, len(jobs), 3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        assert len(set(tickets)) == len(jobs)  # unique tickets under contention
        # fetch in reverse submission order — blocks must resolve regardless
        for j in reversed(range(len(jobs))):
            out = pool.fetch(tickets[j], len(jobs[j][1]))
            np.testing.assert_array_equal(out, refs[j], err_msg=f"job {j}")
    finally:
        pool.close()


def test_prefetch_loader_uses_scaled_decode(mp4_dataset_dir):
    """The prefetch path passes dataset.resolution to the pool; finish() skips
    its cv2 resize (identity when dims already match) and output contracts
    hold."""
    pytest.importorskip("camc2v_tpu.data._native_decode")
    ds = _dataset(mp4_dataset_dir, video_suffix=".mp4")
    dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False, num_workers=2)
    assert dl._pool is not None
    batches = list(dl)
    assert len(batches) == 2
    for b in batches:
        assert b["video"].shape[2:] == (64, 64, 3)
        assert np.isfinite(b["video"]).all()
        assert b["video"].min() >= -1.0 and b["video"].max() <= 1.0
    dl.close()
