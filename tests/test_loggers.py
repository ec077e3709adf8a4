"""Logger / scalar-writer / TensorBoard event emission tests."""

import json
import struct

from medical_image_segmentation_with_visual_prompts_tpu.utils import tb_events
from medical_image_segmentation_with_visual_prompts_tpu.utils.loggers import (
    SummaryWriter, get_logger)


def test_event_writer_roundtrip(tmp_path):
    w = tb_events.EventWriter(tmp_path)
    w.add_scalar("train_loss/seg", 0.5, 1, wall_time=123.0)
    w.add_scalar("val_metric/seg", 0.75, 2, wall_time=124.5)
    w.close()
    payloads = tb_events.read_records(w.path)
    assert len(payloads) == 3  # file_version + 2 scalars
    assert tb_events.decode_scalar_event(payloads[0]) is None
    tag, value, step, wt = tb_events.decode_scalar_event(payloads[1])
    assert (tag, step, wt) == ("train_loss/seg", 1, 123.0)
    assert abs(value - 0.5) < 1e-7
    tag, value, step, wt = tb_events.decode_scalar_event(payloads[2])
    assert (tag, step, wt) == ("val_metric/seg", 2, 124.5)
    assert abs(value - 0.75) < 1e-7


def test_event_file_crc_detects_corruption(tmp_path):
    w = tb_events.EventWriter(tmp_path)
    w.add_scalar("a", 1.0, 0)
    w.close()
    data = bytearray(w.path.read_bytes())
    data[-5] ^= 0xFF  # flip a payload byte
    w.path.write_bytes(bytes(data))
    try:
        tb_events.read_records(w.path)
        assert False, "expected CRC mismatch"
    except ValueError:
        pass


def test_summary_writer_emits_jsonl_and_tb(tmp_path, monkeypatch):
    monkeypatch.setenv("MIVP_TENSORBOARD", "1")
    w = SummaryWriter(tmp_path)
    w.add_scalar("train_loss/tot", 2.0, 3)
    w.close()
    lines = [json.loads(line) for line in
             (tmp_path / "scalars.jsonl").read_text().splitlines()]
    assert lines[0]["tag"] == "train_loss/tot"
    events = sorted(tmp_path.glob("events.out.tfevents.*"))
    assert events, "no TB event file written by default"
    payloads = tb_events.read_records(events[0])
    decoded = [tb_events.decode_scalar_event(p) for p in payloads]
    assert ("train_loss/tot", 2.0, 3) == decoded[-1][:3]


def test_jsonl_to_tb_converter(tmp_path):
    src = tmp_path / "scalars.jsonl"
    with open(src, "w") as f:
        for i in range(3):
            f.write(json.dumps({"tag": "m", "value": float(i), "step": i,
                                "wall_time": 100.0 + i}) + "\n")
    out = tb_events.convert_jsonl(tmp_path)
    payloads = tb_events.read_records(out)
    scalars = [tb_events.decode_scalar_event(p) for p in payloads[1:]]
    assert [s[1] for s in scalars] == [0.0, 1.0, 2.0]
    assert [s[2] for s in scalars] == [0, 1, 2]


def test_tfrecord_framing_layout(tmp_path):
    """The on-disk framing is exactly TFRecord: u64 len, masked CRC of the
    length header, payload, masked CRC of the payload."""
    w = tb_events.EventWriter(tmp_path)
    w.close()
    data = w.path.read_bytes()
    (length,) = struct.unpack_from("<Q", data, 0)
    assert len(data) == 16 + length
    payload = data[12:12 + length]
    assert b"brain.Event:2" in payload
