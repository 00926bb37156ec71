"""Minimal pure-Python GTFS-RT protobuf wire decoder (no dependencies).

The reference vendors generated bindings (``lib/gtfs_realtime_pb2.py``) and
reads exactly five leaves of the FeedMessage tree
(``scripts/realtime_extractor.py:97-118``): ``trip_update.trip.trip_id``,
``trip.start_date``, ``stop_time_update[].stop_sequence``, ``.stop_id``,
``.arrival.time`` / ``.departure.time``. This module decodes that subset
straight off the protobuf wire format — varints + length-delimited fields —
using only the PUBLIC specifications:

- protobuf encoding: https://protobuf.dev/programming-guides/encoding/
- GTFS-RT schema (field numbers): https://gtfs.org/realtime/proto/

Field numbers used (gtfs-realtime.proto, public):

    FeedMessage:    header=1, entity=2(repeated)
    FeedHeader:     timestamp=3
    FeedEntity:     trip_update=3
    TripUpdate:     trip=1, stop_time_update=2(repeated)
    TripDescriptor: trip_id=1, start_date=3
    StopTimeUpdate: stop_sequence=1, arrival=2, departure=3, stop_id=4
    StopTimeEvent:  time=2

Unknown fields of any wire type are skipped, so real-world feeds with
extensions decode fine. Presence semantics match proto2 ``HasField``: an
absent arrival/departure submessage yields ``None`` (the reference's NULL),
and an absent ``time`` inside a present event defaults to 0.
"""

from __future__ import annotations

from typing import Iterator


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    """Base-128 varint at ``buf[i:]`` → (value, next index)."""
    result = 0
    shift = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint")
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def iter_fields(buf: bytes, start: int, end: int) -> Iterator[tuple[int, int, object]]:
    """Yield ``(field_number, wire_type, value)`` for a message span.

    value is an int for varint(0)/fixed64(1)/fixed32(5) fields and a
    ``(start, end)`` span into ``buf`` for length-delimited(2) fields.
    """
    i = start
    while i < end:
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 0x07
        if wire == 0:  # varint
            val, i = _read_varint(buf, i)
            yield field, wire, val
        elif wire == 2:  # length-delimited
            length, i = _read_varint(buf, i)
            if i + length > end:
                raise ValueError("length-delimited field overruns message")
            yield field, wire, (i, i + length)
            i += length
        elif wire == 5:  # fixed32
            yield field, wire, int.from_bytes(buf[i : i + 4], "little")
            i += 4
        elif wire == 1:  # fixed64
            yield field, wire, int.from_bytes(buf[i : i + 8], "little")
            i += 8
        else:  # groups (3/4) are deprecated and absent from GTFS-RT
            raise ValueError(f"unsupported wire type {wire}")


def _decode_stop_time_event(buf: bytes, span: tuple[int, int]) -> int:
    """StopTimeEvent → posix seconds (``time`` = field 2, default 0)."""
    time = 0
    for field, wire, val in iter_fields(buf, *span):
        if field == 2 and wire == 0:
            time = val
    return time


def _decode_stop_time_update(buf: bytes, span: tuple[int, int]) -> dict:
    out = {"stop_sequence": 0, "stop_id": "", "arrival_unix": None, "departure_unix": None}
    for field, wire, val in iter_fields(buf, *span):
        if field == 1 and wire == 0:
            out["stop_sequence"] = val
        elif field == 4 and wire == 2:
            out["stop_id"] = buf[val[0] : val[1]].decode("utf-8")
        elif field == 2 and wire == 2:
            out["arrival_unix"] = _decode_stop_time_event(buf, val)
        elif field == 3 and wire == 2:
            out["departure_unix"] = _decode_stop_time_event(buf, val)
    return out


def _decode_trip_update(buf: bytes, span: tuple[int, int]) -> dict:
    trip_id, start_date, updates = "", "", []
    for field, wire, val in iter_fields(buf, *span):
        if field == 1 and wire == 2:  # TripDescriptor
            for f2, w2, v2 in iter_fields(buf, *val):
                if f2 == 1 and w2 == 2:
                    trip_id = buf[v2[0] : v2[1]].decode("utf-8")
                elif f2 == 3 and w2 == 2:
                    start_date = buf[v2[0] : v2[1]].decode("utf-8")
        elif field == 2 and wire == 2:  # StopTimeUpdate
            updates.append(_decode_stop_time_update(buf, val))
    return {"trip_id": trip_id, "start_date": start_date, "stop_time_update": updates}


def _w_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _w_field(num: int, wire: int, payload: bytes) -> bytes:
    return _w_varint((num << 3) | wire) + payload


def _w_msg(num: int, body: bytes) -> bytes:
    return _w_field(num, 2, _w_varint(len(body)) + body)


def _w_string(num: int, s: str) -> bytes:
    raw = s.encode()
    return _w_field(num, 2, _w_varint(len(raw)) + raw)


def encode_feed_message(
    header_ts: int,
    trips: list[tuple[str, str, list[tuple[int, str, int | None, int | None]]]],
    trailing_vehicle_entity: bool = True,
) -> bytes:
    """Encode a FeedMessage from ``(trip_id, start_date, [(stop_sequence,
    stop_id, arrival_unix|None, departure_unix|None), ...])`` specs — the
    inverse of :func:`parse_feed_message` over the same five leaves, built
    from the same public wire format + field numbers. Used to stage
    byte-exact ``.pb`` fixtures for the decode demo and tests without any
    protobuf runtime. ``trailing_vehicle_entity`` appends a
    vehicle-position-only entity that a correct decoder must skip.
    """
    header = _w_string(1, "2.0") + _w_field(3, 0, _w_varint(header_ts))
    out = _w_msg(1, header)
    for trip_id, start_date, updates in trips:
        trip = _w_string(1, trip_id) + _w_string(3, start_date)
        tu = _w_msg(1, trip)
        for seq, stop_id, arr, dep in updates:
            body = _w_field(1, 0, _w_varint(seq))
            if arr is not None:
                body += _w_msg(2, _w_field(2, 0, _w_varint(arr)))
            if dep is not None:
                body += _w_msg(3, _w_field(2, 0, _w_varint(dep)))
            body += _w_string(4, stop_id)
            tu += _w_msg(2, body)
        entity = _w_string(1, trip_id) + _w_msg(3, tu)
        out += _w_msg(2, entity)
    if trailing_vehicle_entity:
        out += _w_msg(2, _w_string(1, "veh") + _w_msg(4, _w_string(8, "V1")))
    return out


def parse_feed_message(data: bytes) -> tuple[int | None, list[dict]]:
    """FeedMessage bytes → (header timestamp or None, trip_update entities).

    Entities without a ``trip_update`` (vehicle positions, alerts) are
    skipped, mirroring the reference's ``HasField('trip_update')`` filter.
    """
    header_ts: int | None = None
    entities: list[dict] = []
    for field, wire, val in iter_fields(data, 0, len(data)):
        if field == 1 and wire == 2:  # FeedHeader
            for f2, w2, v2 in iter_fields(data, *val):
                if f2 == 3 and w2 == 0:
                    header_ts = v2
        elif field == 2 and wire == 2:  # FeedEntity
            for f2, w2, v2 in iter_fields(data, *val):
                if f2 == 3 and w2 == 2:  # trip_update
                    entities.append(_decode_trip_update(data, v2))
    return header_ts, entities
