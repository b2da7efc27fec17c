"""tfevents writer: record framing, masked CRC32C, proto encode/decode
(replaces the reference's torch SummaryWriter, train.py:488-524)."""

import glob
import os
import struct

import numpy as np

from ed3dgs_tpu.utils.tb_writer import (SummaryWriter, _masked_crc, crc32c,
                                        read_events)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43


def test_scalar_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.5, 1)
    w.add_scalar("train/loss", 0.25, 2)
    w.add_scalar("test/psnr", 31.5, 100)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    rows = read_events(files[0])
    assert (1, "train/loss", 0.5) in rows
    assert (2, "train/loss", 0.25) in rows
    assert any(t == "test/psnr" and s == 100 and abs(v - 31.5) < 1e-6
               for s, t, v in rows)


def test_record_framing_and_crcs(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("a", 1.0, 0)
    w.close()
    path = glob.glob(str(tmp_path / "events.out.tfevents.*"))[0]
    with open(path, "rb") as f:
        blob = f.read()
    # walk records manually, verifying both CRCs of each
    i, n_records = 0, 0
    while i < len(blob):
        header = blob[i:i + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", blob[i + 8:i + 12])
        assert hcrc == _masked_crc(header)
        payload = blob[i + 12:i + 12 + length]
        (pcrc,) = struct.unpack("<I", blob[i + 12 + length:i + 16 + length])
        assert pcrc == _masked_crc(payload)
        i += 16 + length
        n_records += 1
    assert i == len(blob)
    assert n_records == 2  # file_version event + one scalar


def test_image_event_writes(tmp_path):
    w = SummaryWriter(str(tmp_path))
    img = np.random.default_rng(0).random((3, 8, 8)).astype(np.float32)
    w.add_image("render", img, 5)
    w.close()
    path = glob.glob(str(tmp_path / "events.out.tfevents.*"))[0]
    # read_events validates CRCs of every record (images yield no scalar rows)
    rows = read_events(path)
    assert rows == []
    assert os.path.getsize(path) > 100  # png payload present
