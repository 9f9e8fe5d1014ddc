"""TensorBoard event-file writer: framing, checksums, proto round trip.

The reference's scalar stream is tensorboardX events
(lib/utils/utils.py:44-50); ours is a dependency-free encoder
(utils/tb_events.py) verified here against an independent decoder and
known crc32c test vectors.
"""

import glob
import os
import struct

from faster_voxelpose_tpu.utils.tb_events import (
    TBEventWriter,
    crc32c,
    encode_scalar_event,
    frame_record,
    masked_crc32c,
    read_events,
)


def test_crc32c_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_tfrecord_framing():
    payload = b"hello-event"
    rec = frame_record(payload)
    (length,) = struct.unpack_from("<Q", rec, 0)
    assert length == len(payload)
    (lcrc,) = struct.unpack_from("<I", rec, 8)
    assert lcrc == masked_crc32c(rec[:8])
    assert rec[12 : 12 + length] == payload
    (pcrc,) = struct.unpack_from("<I", rec, 12 + length)
    assert pcrc == masked_crc32c(payload)


def test_event_roundtrip(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalar("train_loss_2d", 0.125, 7)
    w.add_scalar("train_loss_joint", 42.5, 8)
    w.close()

    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_events(files[0])
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["tag"] == "train_loss_2d"
    assert events[1]["step"] == 7
    assert abs(events[1]["value"] - 0.125) < 1e-9
    assert events[2]["tag"] == "train_loss_joint"
    assert abs(events[2]["value"] - 42.5) < 1e-6
    assert events[2]["wall"] > 0


def test_scalar_writer_tees_tb(tmp_path):
    from faster_voxelpose_tpu.utils.logging_utils import ScalarWriter

    w = ScalarWriter(str(tmp_path))
    w.add_scalar("metric", 1.5, 3)
    w.close()
    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_events(files[0])
    assert events[-1]["tag"] == "metric" and events[-1]["step"] == 3
    # JSONL stream still present alongside
    assert os.path.exists(os.path.join(str(tmp_path), "scalars.jsonl"))


def test_real_tensorboard_parses_our_files(tmp_path):
    """Decode with TensorBoard's own protobuf classes (not our decoder)."""
    import pytest

    event_pb2 = pytest.importorskip("tensorboard.compat.proto.event_pb2")

    w = TBEventWriter(str(tmp_path))
    w.add_scalar("loss/total", 2.75, 11)
    w.close()
    path = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))[0]
    with open(path, "rb") as fh:
        data = fh.read()
    events = []
    pos = 0
    while pos < len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        ev = event_pb2.Event()
        ev.ParseFromString(data[pos + 12 : pos + 12 + length])
        events.append(ev)
        pos += 16 + length
    assert events[0].file_version == "brain.Event:2"
    assert events[1].step == 11
    assert events[1].summary.value[0].tag == "loss/total"
    assert abs(events[1].summary.value[0].simple_value - 2.75) < 1e-6


def test_scalar_event_decodes_with_varint_multibyte():
    # step > 2**14 exercises multi-byte varints in both directions
    payload = encode_scalar_event("t", 3.0, 123456789, 1.0)
    rec = frame_record(payload)
    import tempfile

    with tempfile.NamedTemporaryFile(delete=False) as fh:
        fh.write(rec)
        name = fh.name
    try:
        ev = read_events(name)[0]
        assert ev["step"] == 123456789 and abs(ev["value"] - 3.0) < 1e-9
    finally:
        os.unlink(name)
