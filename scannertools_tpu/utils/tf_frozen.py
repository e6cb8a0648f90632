"""Pure-python TF frozen-graph constant reader (no tensorflow needed).

Reference parity: the reference feeds ``ssd_mobilenet_v1_coco_2017_11_17``'s
``frozen_inference_graph.pb`` to TF1 (object_detection.py:38-44). A frozen
graph stores every weight as a ``Const`` node's TensorProto; this module
walks the protobuf wire format directly and returns ``{node name: ndarray}``
for float/int32 constants — exactly the mapping-source shape
models/porting_maps.py's ``port_ssd`` consumes (names like
``FeatureExtractor/MobilenetV1/Conv2d_0/weights``).

Schema subset: GraphDef.node = 1 (NodeDef); NodeDef.name = 1, .op = 2,
.attr = 5 (map entry: key = 1, value = 2 AttrValue); AttrValue.tensor = 8
(TensorProto); TensorProto.dtype = 1 (DT_FLOAT=1, DT_INT32=3),
.tensor_shape = 2 (dim = 2 {size = 1}), .tensor_content = 4,
.float_val = 5, .int_val = 6.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .caffemodel import _fields, _read_varint


def _parse_tensorproto(buf: memoryview) -> Optional[np.ndarray]:
    dtype = None
    shape: List[int] = []
    content = b""
    scalars: List[float] = []
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 0:
            dtype = int(payload)
        elif field == 2 and wt == 2:  # TensorShapeProto
            for f2, w2, p2 in _fields(payload):
                if f2 == 2 and w2 == 2:  # Dim
                    for f3, w3, p3 in _fields(p2):
                        if f3 == 1 and w3 == 0:
                            shape.append(int(p3))
        elif field == 4 and wt == 2:
            content = bytes(payload)
        elif field == 5:  # float_val
            if wt == 2:  # packed
                scalars.extend(np.frombuffer(bytes(payload), "<f4").tolist())
            elif wt == 5:
                scalars.append(
                    float(np.frombuffer(bytes(payload), "<f4")[0]))
        elif field == 6 and wt in (0, 2):  # int_val
            def signed(v: int) -> int:
                # protobuf encodes negative int32/int64 as 64-bit
                # two's-complement varints
                return v - (1 << 64) if v >= (1 << 63) else v

            if wt == 0:
                scalars.append(signed(int(payload)))
            else:
                pos = 0
                while pos < len(payload):
                    v, pos = _read_varint(payload, pos)
                    scalars.append(signed(v))
    np_dtype = {1: np.float32, 3: np.int32}.get(dtype)
    if np_dtype is None:
        return None
    n = int(np.prod(shape)) if shape else 1
    if content:
        arr = np.frombuffer(content, np_dtype)
    elif scalars:
        # a single splat value fills the whole shape (TF's compact encoding)
        arr = np.asarray(scalars, np_dtype)
        if arr.size == 1 and n > 1:
            arr = np.full(n, arr[0], np_dtype)
    else:
        arr = np.zeros(n, np_dtype)
    if shape and arr.size == n:
        arr = arr.reshape(shape)
    return arr


def read_frozen_graph(path: str) -> Dict[str, np.ndarray]:
    """frozen_inference_graph.pb -> {const node name: ndarray}."""
    with open(path, "rb") as f:
        raw = f.read()
    out: Dict[str, np.ndarray] = {}
    for field, wt, payload in _fields(memoryview(raw)):
        if field != 1 or wt != 2:  # GraphDef.node
            continue
        name, op = "", ""
        tensor: Optional[np.ndarray] = None
        for f2, w2, p2 in _fields(payload):
            if f2 == 1 and w2 == 2:
                name = bytes(p2).decode("utf-8", "replace")
            elif f2 == 2 and w2 == 2:
                op = bytes(p2).decode("utf-8", "replace")
            elif f2 == 5 and w2 == 2:  # attr map entry
                for f3, w3, p3 in _fields(p2):
                    if f3 == 2 and w3 == 2:  # AttrValue
                        for f4, w4, p4 in _fields(p3):
                            if f4 == 8 and w4 == 2:  # .tensor
                                t = _parse_tensorproto(p4)
                                if t is not None:
                                    tensor = t
        if op == "Const" and name and tensor is not None:
            out[name] = tensor
    return out
