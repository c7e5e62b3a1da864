"""PPX wire codec: hand-written flatbuffers encode/decode for the schema in
ppx.fbs, using the flatbuffers Python runtime directly (no generated
classes).  Layout matches the reference's generated bindings byte-for-byte
(same tables, field order, union tags, "PPXF" identifier), so this client
interoperates with existing pyprob_cpp simulators.

Tensor codec: float64 data + int32 shape (reference: pyprob/remote.py:100-122).
"""

from __future__ import annotations

from collections import namedtuple

import numpy as np
import flatbuffers
from flatbuffers import number_types as N
from flatbuffers.table import Table


# ---------------------------------------------------------------------------
# enums (reference: ppx/MessageBody.py:5-17, ppx/Distribution.py:5-17)
# ---------------------------------------------------------------------------


class MessageBody:
    NONE = 0
    Handshake = 1
    HandshakeResult = 2
    Run = 3
    RunResult = 4
    Sample = 5
    SampleResult = 6
    Observe = 7
    ObserveResult = 8
    Tag = 9
    TagResult = 10
    Reset = 11


class DistributionType:
    NONE = 0
    Normal = 1
    Uniform = 2
    Categorical = 3
    Poisson = 4
    Bernoulli = 5
    Beta = 6
    Exponential = 7
    Gamma = 8
    LogNormal = 9
    Binomial = 10
    Weibull = 11


FILE_IDENTIFIER = b"PPXF"

# distribution tag -> field names in slot order (each field is a Tensor)
DIST_FIELDS = {
    DistributionType.Normal: ("mean", "stddev"),
    DistributionType.Uniform: ("low", "high"),
    DistributionType.Categorical: ("probs",),
    DistributionType.Poisson: ("rate",),
    DistributionType.Bernoulli: ("probs",),
    DistributionType.Beta: ("concentration1", "concentration0"),
    DistributionType.Exponential: ("rate",),
    DistributionType.Gamma: ("concentration", "rate"),
    DistributionType.LogNormal: ("loc", "scale"),
    DistributionType.Binomial: ("total_count", "probs"),
    DistributionType.Weibull: ("scale", "concentration"),
}

DIST_NAMES = {
    DistributionType.Normal: "Normal",
    DistributionType.Uniform: "Uniform",
    DistributionType.Categorical: "Categorical",
    DistributionType.Poisson: "Poisson",
    DistributionType.Bernoulli: "Bernoulli",
    DistributionType.Beta: "Beta",
    DistributionType.Exponential: "Exponential",
    DistributionType.Gamma: "Gamma",
    DistributionType.LogNormal: "LogNormal",
    DistributionType.Binomial: "Binomial",
    DistributionType.Weibull: "Weibull",
}


# ---------------------------------------------------------------------------
# table reading helpers (slot i lives at vtable offset 4 + 2*i)
# ---------------------------------------------------------------------------


def _root_table(buf):
    n = flatbuffers.encode.Get(flatbuffers.packer.uoffset, buf, 0)
    return Table(buf, n)


def _slot(i):
    return 4 + 2 * i


def _get_u8(tab, i, default=0):
    o = N.UOffsetTFlags.py_type(tab.Offset(_slot(i)))
    if o != 0:
        return tab.Get(N.Uint8Flags, o + tab.Pos)
    return default


def _get_bool(tab, i, default=False):
    o = N.UOffsetTFlags.py_type(tab.Offset(_slot(i)))
    if o != 0:
        return bool(tab.Get(N.BoolFlags, o + tab.Pos))
    return default


def _get_string(tab, i):
    o = N.UOffsetTFlags.py_type(tab.Offset(_slot(i)))
    if o != 0:
        s = tab.String(o + tab.Pos)
        return s.decode("utf-8") if isinstance(s, bytes) else s
    return None


def _get_table(tab, i):
    o = N.UOffsetTFlags.py_type(tab.Offset(_slot(i)))
    if o != 0:
        return Table(tab.Bytes, tab.Indirect(o + tab.Pos))
    return None


def _get_union_table(tab, i):
    o = N.UOffsetTFlags.py_type(tab.Offset(_slot(i)))
    if o != 0:
        obj = Table(bytearray(), 0)
        tab.Union(obj, o)
        return obj
    return None


def _get_f64_vector(tab, i):
    o = N.UOffsetTFlags.py_type(tab.Offset(_slot(i)))
    if o != 0:
        return tab.GetVectorAsNumpy(N.Float64Flags, o)
    return None


def _get_i32_vector(tab, i):
    o = N.UOffsetTFlags.py_type(tab.Offset(_slot(i)))
    if o != 0:
        return tab.GetVectorAsNumpy(N.Int32Flags, o)
    return None


# ---------------------------------------------------------------------------
# tensor codec
# ---------------------------------------------------------------------------


def read_tensor(tab):
    """Tensor table -> numpy array (float64 data reshaped by int32 shape)."""
    if tab is None:
        return None
    data = _get_f64_vector(tab, 0)
    shape = _get_i32_vector(tab, 1)
    if data is None:
        return None
    arr = np.array(data, dtype=np.float64)
    if shape is not None and len(shape):
        arr = arr.reshape(tuple(int(s) for s in shape))
    elif shape is not None:
        arr = arr.reshape(())
    return arr


def build_tensor(builder, value):
    """numpy-able value -> Tensor table offset."""
    arr = np.asarray(value, dtype=np.float64)
    data = arr.reshape(-1)
    shape = np.asarray(arr.shape, dtype=np.int32)
    data_off = builder.CreateNumpyVector(data)
    shape_off = builder.CreateNumpyVector(shape)
    builder.StartObject(2)
    builder.PrependUOffsetTRelativeSlot(0, data_off, 0)
    builder.PrependUOffsetTRelativeSlot(1, shape_off, 0)
    return builder.EndObject()


# ---------------------------------------------------------------------------
# decoded message structures
# ---------------------------------------------------------------------------

DistSpec = namedtuple("DistSpec", ["type", "name", "params"])
Decoded = namedtuple("Decoded", ["body_type", "fields"])


def read_distribution(dist_type, tab):
    if dist_type == DistributionType.NONE or tab is None:
        return None
    fields = DIST_FIELDS[dist_type]
    params = {}
    for i, f in enumerate(fields):
        params[f] = read_tensor(_get_table(tab, i))
    return DistSpec(dist_type, DIST_NAMES[dist_type], params)


def decode_message(buf):
    msg = _root_table(buf)
    body_type = _get_u8(msg, 0)
    body = _get_union_table(msg, 1)
    f = {}
    if body_type == MessageBody.Handshake:
        f["system_name"] = _get_string(body, 0)
    elif body_type == MessageBody.HandshakeResult:
        f["system_name"] = _get_string(body, 0)
        f["model_name"] = _get_string(body, 1)
    elif body_type == MessageBody.Run:
        # payload: OPTIONAL trailing field (pyprob_tpu extension) — absent
        # in reference-built Run messages, ignored by reference readers
        # (flatbuffers tables skip unknown trailing fields), so wire parity
        # is preserved in both directions
        f["payload"] = read_tensor(_get_table(body, 0)) if body is not None else None
    elif body_type == MessageBody.RunResult:
        f["result"] = read_tensor(_get_table(body, 0))
    elif body_type == MessageBody.Sample:
        f["address"] = _get_string(body, 0)
        f["name"] = _get_string(body, 1)
        dist_type = _get_u8(body, 2)
        f["distribution"] = read_distribution(
            dist_type, _get_union_table(body, 3)
        )
        f["control"] = _get_bool(body, 4, True)
    elif body_type == MessageBody.SampleResult:
        f["result"] = read_tensor(_get_table(body, 0))
    elif body_type == MessageBody.Observe:
        f["address"] = _get_string(body, 0)
        f["name"] = _get_string(body, 1)
        dist_type = _get_u8(body, 2)
        f["distribution"] = read_distribution(
            dist_type, _get_union_table(body, 3)
        )
        f["value"] = read_tensor(_get_table(body, 4))
    elif body_type == MessageBody.Tag:
        f["address"] = _get_string(body, 0)
        f["name"] = _get_string(body, 1)
        f["value"] = read_tensor(_get_table(body, 2))
    elif body_type in (
        MessageBody.ObserveResult,
        MessageBody.TagResult,
        MessageBody.Reset,
    ):
        pass
    else:
        raise RuntimeError(f"Unknown PPX message body type: {body_type}")
    return Decoded(body_type, f)


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def _finish_message(builder, body_type, body_off):
    builder.StartObject(2)
    builder.PrependUint8Slot(0, body_type, 0)
    builder.PrependUOffsetTRelativeSlot(1, body_off, 0)
    msg = builder.EndObject()
    builder.Finish(msg, file_identifier=FILE_IDENTIFIER)
    return bytes(builder.Output())


def build_handshake(system_name):
    b = flatbuffers.Builder(64)
    s = b.CreateString(system_name)
    b.StartObject(1)
    b.PrependUOffsetTRelativeSlot(0, s, 0)
    body = b.EndObject()
    return _finish_message(b, MessageBody.Handshake, body)


def build_handshake_result(system_name, model_name):
    b = flatbuffers.Builder(128)
    s = b.CreateString(system_name)
    m = b.CreateString(model_name)
    b.StartObject(2)
    b.PrependUOffsetTRelativeSlot(0, s, 0)
    b.PrependUOffsetTRelativeSlot(1, m, 0)
    body = b.EndObject()
    return _finish_message(b, MessageBody.HandshakeResult, body)


def build_run(payload=None):
    # with payload=None the bytes are identical to the reference's empty
    # Run table (wire parity); a payload adds an optional trailing Tensor
    # field that old readers skip
    if payload is None:
        b = flatbuffers.Builder(32)
        b.StartObject(0)
        body = b.EndObject()
        return _finish_message(b, MessageBody.Run, body)
    b = flatbuffers.Builder(256)
    t = build_tensor(b, payload)
    b.StartObject(1)
    b.PrependUOffsetTRelativeSlot(0, t, 0)
    body = b.EndObject()
    return _finish_message(b, MessageBody.Run, body)


def build_run_result(result):
    b = flatbuffers.Builder(256)
    t = build_tensor(b, result)
    b.StartObject(1)
    b.PrependUOffsetTRelativeSlot(0, t, 0)
    body = b.EndObject()
    return _finish_message(b, MessageBody.RunResult, body)


def build_distribution(builder, dist_type, params):
    """params: dict of field -> numpy-able; returns (type, offset)."""
    fields = DIST_FIELDS[dist_type]
    offs = [build_tensor(builder, params[f]) for f in fields]
    builder.StartObject(len(fields))
    for i, off in enumerate(offs):
        builder.PrependUOffsetTRelativeSlot(i, off, 0)
    return builder.EndObject()


def build_sample(address, name, dist_type, dist_params, control=True):
    b = flatbuffers.Builder(512)
    addr = b.CreateString(address or "")
    nm = b.CreateString(name or "")
    dist = build_distribution(b, dist_type, dist_params)
    b.StartObject(5)
    b.PrependUOffsetTRelativeSlot(0, addr, 0)
    b.PrependUOffsetTRelativeSlot(1, nm, 0)
    b.PrependUint8Slot(2, dist_type, 0)
    b.PrependUOffsetTRelativeSlot(3, dist, 0)
    b.PrependBoolSlot(4, control, True)
    body = b.EndObject()
    return _finish_message(b, MessageBody.Sample, body)


def build_sample_result(result):
    b = flatbuffers.Builder(256)
    t = build_tensor(b, result)
    b.StartObject(1)
    b.PrependUOffsetTRelativeSlot(0, t, 0)
    body = b.EndObject()
    return _finish_message(b, MessageBody.SampleResult, body)


def build_observe(address, name, dist_type=0, dist_params=None, value=None):
    b = flatbuffers.Builder(512)
    addr = b.CreateString(address or "")
    nm = b.CreateString(name or "")
    dist = (
        build_distribution(b, dist_type, dist_params)
        if dist_type != DistributionType.NONE
        else None
    )
    val = build_tensor(b, value) if value is not None else None
    b.StartObject(5)
    b.PrependUOffsetTRelativeSlot(0, addr, 0)
    b.PrependUOffsetTRelativeSlot(1, nm, 0)
    b.PrependUint8Slot(2, dist_type, 0)
    if dist is not None:
        b.PrependUOffsetTRelativeSlot(3, dist, 0)
    if val is not None:
        b.PrependUOffsetTRelativeSlot(4, val, 0)
    body = b.EndObject()
    return _finish_message(b, MessageBody.Observe, body)


def build_observe_result():
    b = flatbuffers.Builder(32)
    b.StartObject(0)
    body = b.EndObject()
    return _finish_message(b, MessageBody.ObserveResult, body)


def build_tag(address, name, value):
    b = flatbuffers.Builder(256)
    addr = b.CreateString(address or "")
    nm = b.CreateString(name or "")
    val = build_tensor(b, value)
    b.StartObject(3)
    b.PrependUOffsetTRelativeSlot(0, addr, 0)
    b.PrependUOffsetTRelativeSlot(1, nm, 0)
    b.PrependUOffsetTRelativeSlot(2, val, 0)
    body = b.EndObject()
    return _finish_message(b, MessageBody.Tag, body)


def build_tag_result():
    b = flatbuffers.Builder(32)
    b.StartObject(0)
    body = b.EndObject()
    return _finish_message(b, MessageBody.TagResult, body)


def build_reset():
    b = flatbuffers.Builder(32)
    b.StartObject(0)
    body = b.EndObject()
    return _finish_message(b, MessageBody.Reset, body)
