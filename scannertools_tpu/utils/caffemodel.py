"""Pure-python caffemodel reader (protobuf wire format, no caffe/protoc).

Reference parity: the reference loads caffemodels through caffe::Net
(caffe_kernel.cpp:267-332) for OpenPose body/face/hand
(openpose_kernel.cpp:35-78) and Faster-RCNN VGG16 (faster_rcnn_kernel.cpp).
This environment has no caffe, so this module decodes the protobuf wire
format of ``NetParameter`` directly and emits the
``{"<layer>.weight": OIHW ndarray, "<layer>.bias": ndarray}`` dict shape
that models/porting_maps.py's caffe-name maps consume.

Supported schema subset (caffe.proto):
  NetParameter:   layer = 100 (LayerParameter), layers = 2 (V1LayerParameter)
  LayerParameter: name = 1 (string), blobs = 7 (BlobProto)
  V1LayerParameter: name = 4, blobs = 6
  BlobProto:      shape = 7 (BlobShape.dim = 1, varint), data = 5 (float,
                  packed or unpacked), legacy dims num/channels/height/width
                  = 1/2/3/4 (int32)
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Tuple

import numpy as np


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _fields(buf: memoryview) -> Iterator[Tuple[int, int, memoryview]]:
    """Yield (field_number, wire_type, payload) over a message buffer.
    Payload: varint value encoded back for type 0; raw bytes otherwise."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, pos = _read_varint(buf, pos)
            yield field, wt, val
        elif wt == 1:  # 64-bit
            yield field, wt, buf[pos:pos + 8]
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            yield field, wt, buf[pos:pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            yield field, wt, buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt} (field {field})")


def _parse_blob(buf: memoryview) -> np.ndarray:
    shape: List[int] = []
    legacy = [0, 0, 0, 0]  # num, channels, height, width
    data_chunks: List[np.ndarray] = []
    for field, wt, payload in _fields(buf):
        if field == 7 and wt == 2:  # BlobShape
            for f2, w2, p2 in _fields(payload):
                if f2 == 1 and w2 == 0:
                    shape.append(int(p2))
                elif f2 == 1 and w2 == 2:  # packed dims
                    pos = 0
                    while pos < len(p2):
                        d, pos = _read_varint(p2, pos)
                        shape.append(d)
        elif field == 5:  # float data
            if wt == 2:  # packed
                data_chunks.append(np.frombuffer(bytes(payload), "<f4"))
            elif wt == 5:  # unpacked single float
                data_chunks.append(
                    np.asarray([struct.unpack("<f", bytes(payload))[0]],
                               np.float32))
        elif field in (1, 2, 3, 4) and wt == 0:
            legacy[field - 1] = int(payload)
    data = (np.concatenate(data_chunks) if data_chunks
            else np.zeros(0, np.float32))
    if not shape and any(legacy):
        shape = [d for d in legacy if d] if data.size != int(
            np.prod([d or 1 for d in legacy])) else [d or 1 for d in legacy]
    if shape and int(np.prod(shape)) == data.size:
        return data.reshape(shape)
    return data


def _parse_layer(buf: memoryview, name_field: int,
                 blobs_field: int) -> Tuple[str, List[np.ndarray]]:
    name = ""
    blobs: List[np.ndarray] = []
    for field, wt, payload in _fields(buf):
        if field == name_field and wt == 2:
            name = bytes(payload).decode("utf-8", "replace")
        elif field == blobs_field and wt == 2:
            blobs.append(_parse_blob(payload))
    return name, blobs


def read_caffemodel(path: str) -> Dict[str, np.ndarray]:
    """caffemodel file -> ``{layer.weight: ndarray, layer.bias: ndarray}``
    (weight = blob 0, OIHW as stored; bias = blob 1 when present; extra
    blobs as ``layer.blob<k>``). Layers without blobs are skipped."""
    with open(path, "rb") as f:
        raw = f.read()
    return parse_netparameter(raw)


def parse_netparameter(raw: bytes) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for field, wt, payload in _fields(memoryview(raw)):
        if wt != 2 or field not in (100, 2):
            continue
        if field == 100:  # LayerParameter
            name, blobs = _parse_layer(payload, name_field=1, blobs_field=7)
        else:  # V1LayerParameter
            name, blobs = _parse_layer(payload, name_field=4, blobs_field=6)
        if not name or not blobs:
            continue
        for k, b in enumerate(blobs):
            suffix = ("weight", "bias")[k] if k < 2 else f"blob{k}"
            out[f"{name}.{suffix}"] = b
    return out
