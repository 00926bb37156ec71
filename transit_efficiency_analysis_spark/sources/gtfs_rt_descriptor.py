"""Checked-in GTFS-RT ``FileDescriptorSet`` for the JVM decode path.

``decode_protobuf_payloads_jvm`` (``gtfs_realtime.py``) needs a
protoc-compiled descriptor file — spark-protobuf's standard deployment
contract (``protoc --descriptor_set_out=...``). This container ships no
protoc and no protobuf runtime, so the descriptor is BUILT here instead:
``descriptor.proto``'s messages (FileDescriptorSet / FileDescriptorProto /
DescriptorProto / FieldDescriptorProto) are themselves plain protobuf,
so the same public wire format the repo already encodes with
(``gtfs_rt_wire._w_*`` — varints + length-delimited fields) can emit a
byte-exact descriptor set with zero dependencies. Sources, all public:

- descriptor.proto message/field numbers:
  https://protobuf.dev/reference/protobuf/google.protobuf/ and the
  protobuf repo's ``google/protobuf/descriptor.proto``
- GTFS-RT schema (message shapes + field numbers): https://gtfs.org/realtime/proto/

The emitted schema is the SUBSET of ``transit_realtime`` the pipeline
reads (the same five leaves as the wire decoder — reference
``scripts/realtime_extractor.py:97-118`` — plus the entity/header spine),
with every field optional: proto2 decoders skip unknown fields, so real
feeds with alerts/vehicle positions decode fine, and nothing is required
so partial synthetic fixtures parse too. Regenerate the checked-in file
with ``python -m transit_efficiency_analysis_spark.sources.gtfs_rt_descriptor``;
tests/test_ingest.py asserts the file matches :func:`build_descriptor_set`
byte-for-byte.
"""

from __future__ import annotations

import os

from transit_efficiency_analysis_spark.sources.gtfs_rt_wire import (
    _w_field,
    _w_msg,
    _w_string,
    _w_varint,
)

#: the checked-in descriptor file, bundled next to this module
DESCRIPTOR_PATH = os.path.join(os.path.dirname(__file__), "gtfs_rt.desc")

# FieldDescriptorProto.Type values (descriptor.proto, public)
_T_INT64 = 3
_T_UINT64 = 4
_T_INT32 = 5
_T_STRING = 9
_T_MESSAGE = 11
_T_UINT32 = 13

# FieldDescriptorProto.Label values
_L_OPTIONAL = 1
_L_REPEATED = 3

#: message name -> [(field name, number, label, type, type_name|None)];
#: numbers/types are the public gtfs-realtime.proto declarations
_MESSAGES: dict[str, list[tuple[str, int, int, int, str | None]]] = {
    "FeedMessage": [
        ("header", 1, _L_OPTIONAL, _T_MESSAGE, ".transit_realtime.FeedHeader"),
        ("entity", 2, _L_REPEATED, _T_MESSAGE, ".transit_realtime.FeedEntity"),
    ],
    "FeedHeader": [
        ("gtfs_realtime_version", 1, _L_OPTIONAL, _T_STRING, None),
        ("timestamp", 3, _L_OPTIONAL, _T_UINT64, None),
    ],
    "FeedEntity": [
        ("id", 1, _L_OPTIONAL, _T_STRING, None),
        ("trip_update", 3, _L_OPTIONAL, _T_MESSAGE, ".transit_realtime.TripUpdate"),
    ],
    "TripUpdate": [
        ("trip", 1, _L_OPTIONAL, _T_MESSAGE, ".transit_realtime.TripDescriptor"),
        (
            "stop_time_update",
            2,
            _L_REPEATED,
            _T_MESSAGE,
            ".transit_realtime.StopTimeUpdate",
        ),
    ],
    "TripDescriptor": [
        ("trip_id", 1, _L_OPTIONAL, _T_STRING, None),
        ("start_date", 3, _L_OPTIONAL, _T_STRING, None),
    ],
    "StopTimeUpdate": [
        ("stop_sequence", 1, _L_OPTIONAL, _T_UINT32, None),
        ("arrival", 2, _L_OPTIONAL, _T_MESSAGE, ".transit_realtime.StopTimeEvent"),
        ("departure", 3, _L_OPTIONAL, _T_MESSAGE, ".transit_realtime.StopTimeEvent"),
        ("stop_id", 4, _L_OPTIONAL, _T_STRING, None),
    ],
    "StopTimeEvent": [
        ("delay", 1, _L_OPTIONAL, _T_INT32, None),
        ("time", 2, _L_OPTIONAL, _T_INT64, None),
    ],
}


def _field_descriptor(
    name: str, number: int, label: int, ftype: int, type_name: str | None
) -> bytes:
    """FieldDescriptorProto: name=1, number=3, label=4, type=5, type_name=6."""
    body = _w_string(1, name)
    body += _w_field(3, 0, _w_varint(number))
    body += _w_field(4, 0, _w_varint(label))
    body += _w_field(5, 0, _w_varint(ftype))
    if type_name is not None:
        body += _w_string(6, type_name)
    return body


def _message_descriptor(name: str) -> bytes:
    """DescriptorProto: name=1, field=2 (repeated)."""
    body = _w_string(1, name)
    for spec in _MESSAGES[name]:
        body += _w_msg(2, _field_descriptor(*spec))
    return body


def build_descriptor_set() -> bytes:
    """The ``FileDescriptorSet`` bytes: one FileDescriptorProto
    (name=1, package=2, message_type=4 repeated; no syntax field →
    proto2, matching gtfs-realtime.proto)."""
    fdp = _w_string(1, "gtfs_realtime_subset.proto")
    fdp += _w_string(2, "transit_realtime")
    for name in _MESSAGES:
        fdp += _w_msg(4, _message_descriptor(name))
    return _w_msg(1, fdp)


def main() -> None:
    data = build_descriptor_set()
    with open(DESCRIPTOR_PATH, "wb") as f:
        f.write(data)
    print(f"wrote {len(data)} bytes to {DESCRIPTOR_PATH}")


if __name__ == "__main__":
    main()
