"""Real multi-host assembly: 2 jax.distributed processes on localhost.

The round-1 gap (VERDICT Missing #2): the sharded encoders device_get the
whole sharded buffer, which raises for non-addressable shards on real
multi-host. This test runs TWO OS processes, each owning 4 of the 8
virtual CPU devices, through the full sharded gray AND color encodes —
per-host fetch of addressable shards, DCN (process_allgather) segment
exchange, coordinator assembly — and pins the result to the single-process
host coder's restart stream.
"""
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"


def test_two_process_sharded_encode(tmp_path):
    port = 12913
    out = tmp_path / "mh"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(pid), str(out)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-4000:]}"
        assert f"WORKER_OK {pid}" in log

    gray = [(out.parent / f"{out.name}.gray.p{pid}").read_bytes() for pid in (0, 1)]
    gray_opt = [
        (out.parent / f"{out.name}.grayopt.p{pid}").read_bytes()
        for pid in (0, 1)
    ]
    color = [(out.parent / f"{out.name}.color.p{pid}").read_bytes() for pid in (0, 1)]
    # every host assembles the identical full stream
    assert gray[0] == gray[1]
    assert gray_opt[0] == gray_opt[1]
    assert color[0] == color[1]
    # optimal tables must actually optimize (and still decode the same)
    assert len(gray_opt[0]) < len(gray[0])
    import io

    from PIL import Image

    a = np.asarray(Image.open(io.BytesIO(gray_opt[0])))
    b = np.asarray(Image.open(io.BytesIO(gray[0])))
    np.testing.assert_array_equal(a, b)

    # pin the gray stream to the single-process host coder (restart
    # interval = MCUs per shard on the 8-way mesh)
    from jpegtpu import pipeline
    from jpegtpu.config import EncodeConfig

    img = (np.arange(128 * 64, dtype=np.int64).reshape(128, 64) * 7 % 256).astype(
        np.uint8
    )
    mcu_per_shard = (128 // 8 // 8) * (64 // 8)
    want = pipeline.encode_grayscale(
        img, EncodeConfig(restart_interval=mcu_per_shard, entropy="host")
    )
    assert gray[0] == want

    # color: must decode identically to the single-chip color encode
    import io

    from PIL import Image

    from jpegtpu import color_pipeline

    cimg = np.stack([img, img[::-1], img[:, ::-1]], axis=-1)
    single = color_pipeline.encode_color(cimg, EncodeConfig(subsampling="420"))
    a = np.asarray(Image.open(io.BytesIO(color[0])).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(single)).convert("RGB"))
    np.testing.assert_array_equal(a, b)
