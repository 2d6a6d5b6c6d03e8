"""TensorBoard event-writer tests: TFRecord framing, CRCs, proto fields."""

import glob
import os
import struct

import numpy as np
import pytest

from contextgs_tpu.utils.tboard import SummaryWriter, _masked_crc, crc32c


def read_records(path):
    out = []
    with open(path, "rb") as f:
        data = f.read()
    i = 0
    while i < len(data):
        (ln,) = struct.unpack_from("<Q", data, i)
        (lcrc,) = struct.unpack_from("<I", data, i + 8)
        assert lcrc == _masked_crc(data[i:i + 8])
        payload = data[i + 12:i + 12 + ln]
        (pcrc,) = struct.unpack_from("<I", data, i + 12 + ln)
        assert pcrc == _masked_crc(payload)
        out.append(payload)
        i += 12 + ln + 4
    return out


def parse_fields(buf):
    """Minimal proto walk → {field_num: [values]} (varint/fixed64/len/fixed32)."""
    fields = {}
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        num, wire = key >> 3, key & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            v = struct.unpack_from("<d", buf, i)[0]
            i += 8
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i:i + ln]
            i += ln
        elif wire == 5:
            v = struct.unpack_from("<f", buf, i)[0]
            i += 4
        else:
            raise AssertionError(f"wire {wire}")
        fields.setdefault(num, []).append(v)
    return fields


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 zero bytes → 0x8A9136AA
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_scalars_and_image_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.5, 10)
    w.add_scalar("train/psnr", 31.25, 10)
    img = np.zeros((8, 6, 3), np.float32)
    img[:, :3] = 1.0
    w.add_image("render", img, 20)
    w.close()

    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    recs = read_records(files[0])
    assert len(recs) == 4  # file_version + 2 scalars + 1 image

    head = parse_fields(recs[0])
    assert head[3] == [b"brain.Event:2"]

    ev = parse_fields(recs[1])
    assert ev[2] == [10]                       # step
    val = parse_fields(parse_fields(ev[5][0])[1][0])
    assert val[1] == [b"train/loss"]
    assert val[2] == pytest.approx([0.5])

    ev2 = parse_fields(recs[2])
    val2 = parse_fields(parse_fields(ev2[5][0])[1][0])
    assert val2[1] == [b"train/psnr"]
    assert val2[2] == pytest.approx([31.25])

    ev3 = parse_fields(recs[3])
    assert ev3[2] == [20]
    val3 = parse_fields(parse_fields(ev3[5][0])[1][0])
    assert val3[1] == [b"render"]
    im = parse_fields(val3[4][0])
    assert im[1] == [8] and im[2] == [6] and im[3] == [3]
    png = im[4][0]
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image
    import io
    arr = np.asarray(Image.open(io.BytesIO(png)))
    assert arr.shape == (8, 6, 3)
    assert arr[0, 0, 0] == 255 and arr[0, 5, 0] == 0
