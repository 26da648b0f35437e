"""Stream-parser chip: DFA constraint satisfaction on a synthetic
interleaved TLS tape, bus balance against host-derived messages, and
tamper detection.  Full-machine integration over the fixture runs in
test_guest_machine.py."""

import struct
from types import SimpleNamespace

import numpy as np

from zktls_tpu.core.tape import encode_stream, StreamSegment, stream_halves
from zktls_tpu.ops.field_ref import Fp4, P
from zktls_tpu.stark.bus import (
    BUS_CT_BYTE,
    BUS_NONCE_BYTE,
    BUS_PARSE_REC,
    BUS_SHA_BLOCK,
    BUS_TAG_BYTE,
    MAX_PAYLOAD,
    bus_term,
    delta_powers,
)
from zktls_tpu.stark.chips.stream_parser import (
    LAYOUT,
    RPOS_SENTINEL,
    StreamParserAir,
    parser_sessions_from_replay,
    parser_trace,
    _sha_pad,
)
from zktls_tpu.stark.debug import check_trace

AIR = StreamParserAir()
CHALLENGES = [Fp4(321, 7, 2, 11)] + delta_powers(Fp4(55, 13, 8, 3),
                                                 MAX_PAYLOAD)


def _rec(typ: int, body: bytes) -> bytes:
    return bytes([typ, 3, 3]) + struct.pack(">H", len(body)) + body


def _mini_session():
    """Synthetic TLS-1.2-shaped session: CCS boundaries, an encrypted
    handshake record, a response AppData record split across segments."""
    tag_c = bytes(range(16))
    tag_f = bytes(range(16, 32))
    tag_r = bytes(range(32, 48))
    ct_c = b"client-req-bytes-xyz"        # 20 B
    ct_f = b"srv-finished-ct!"            # 16 B
    ct_r = b"HTTP/1.1 200 OK response body here."  # 35 B
    c_recs = (_rec(22, b"hello from client") + _rec(20, b"\x01")
              + _rec(23, b"CNONCE00" + ct_c + tag_c))
    s_pre = _rec(22, b"server hello and friends") + _rec(20, b"\x01")
    s_fin = _rec(22, b"SNONCE11" + ct_f + tag_f)
    s_resp = _rec(23, b"SNONCE22" + ct_r + tag_r)
    s_all = s_pre + s_fin + s_resp
    # split the server bytes so the response record straddles segments,
    # interleaved with client segments
    cut = len(s_pre) + len(s_fin) + 9   # mid-record
    segs = [
        StreamSegment(2, c_recs[:15]),
        StreamSegment(1, s_all[:cut]),
        StreamSegment(2, c_recs[15:]),
        StreamSegment(1, s_all[cut:]),
    ]
    stream = encode_stream(segs)
    events = [
        SimpleNamespace(tag=tag_f, plaintext=b""),
        SimpleNamespace(tag=tag_c, plaintext=b""),
        SimpleNamespace(tag=tag_r, plaintext=b""),
    ]
    return stream, events


def parser_messages(stream: bytes, events, v13: int, obj: int):
    """Host-side expected bus messages (the counterpart chips' view)."""
    tag_to_eid = {bytes(ev.tag): i for i, ev in enumerate(events)}
    msgs = []
    padded = _sha_pad(stream)
    for blk in range(len(padded) // 64):
        block = padded[64 * blk : 64 * blk + 64]
        for half in (0, 1):
            hb = block[32 * half : 32 * half + 32]
            limbs = []
            for j in range(8):
                w = hb[4 * j : 4 * j + 4]
                limbs += [w[2] * 256 + w[3], w[0] * 256 + w[1]]
            msgs.append((BUS_SHA_BLOCK, [obj, blk, half] + limbs, 1))
    c2s, s2c = stream_halves(stream)
    for dk, data in (("c", c2s), ("s", s2c)):
        dsv = 1 if dk == "s" else 0
        enc, cnt, dtot = 0, 0, 0
        pos = 0
        while pos < len(data):
            typ = data[pos]
            ln = struct.unpack(">H", data[pos + 3 : pos + 5])[0]
            body = data[pos + 5 : pos + 5 + ln]
            isg = (1 if typ == 23 else 0) if v13 else enc
            if isg:
                if v13:
                    nonce, ct, tag = b"", body[:-16], body[-16:]
                else:
                    nonce, ct, tag = body[:8], body[8:-16], body[-16:]
                eid = tag_to_eid[bytes(tag)]
                ctlen = len(ct)
                if v13:
                    ev = events[eid]
                    isr = 1 if ev.plaintext and ev.plaintext[-1] == 23 \
                        else 0
                else:
                    isr = 1 if typ == 23 else 0
                msgs.append((BUS_PARSE_REC,
                             [eid, cnt, typ, ctlen, v13, isr * dsv], -1))
                for j, byq in enumerate(nonce):
                    msgs.append((BUS_NONCE_BYTE, [eid, 7 - j, byq], -1))
                for j, byq in enumerate(tag):
                    msgs.append((BUS_TAG_BYTE, [eid, 15 - j, byq], -1))
                for j, byq in enumerate(ct):
                    isrb = isr and not (v13 and j == ctlen - 1)
                    rpos = dtot + j if isrb else RPOS_SENTINEL
                    msgs.append((BUS_CT_BYTE,
                                 [eid, ctlen - 1 - j, byq, rpos, isr,
                                  v13, obj, dsv, 1 if isrb else 0], -1))
                if isr:
                    dtot += ctlen - v13
                cnt += 1
            if typ == 20 and not enc:
                enc = 1
            pos += 5 + ln
    return msgs


def _balance(bus_sum, msgs):
    total = Fp4(*bus_sum)
    for tag, payload, mult in msgs:
        t = bus_term(CHALLENGES, tag, payload)
        total = total + (t if mult > 0 else Fp4(0) - t)
    return total


def _build(stream, events, v13=0, obj=1):
    sess = parser_sessions_from_replay(stream, events, bool(v13), obj)
    trace, publics = parser_trace([sess])
    perm = AIR.generate_perm_trace(trace, publics, CHALLENGES)
    bus_sum = [int(v) for v in perm[-1, -4:]]
    return trace, perm, bus_sum


def test_mini_tape_constraints_and_balance():
    stream, events = _mini_session()
    trace, perm, bus_sum = _build(stream, events)
    fails = check_trace(AIR, trace, bus_sum, perm_trace=perm,
                        challenges=CHALLENGES)
    assert fails == []
    msgs = parser_messages(stream, events, 0, 1)
    assert _balance(bus_sum, msgs) == Fp4(0)


def test_ct_byte_flip_breaks_balance():
    stream, events = _mini_session()
    _, _, bus_sum = _build(stream, events)
    msgs = parser_messages(stream, events, 0, 1)
    # tamper with the tape: flip one ciphertext byte of the response
    idx = stream.index(b"200 OK")
    bad = bytearray(stream)
    bad[idx] ^= 0x40
    _, _, bad_sum = _build(bytes(bad), events)
    # the honest counterpart messages no longer balance the tampered tape
    assert _balance(bad_sum, msgs) != Fp4(0)
    # ...but the tampered tape balances its own message view (blocks too)
    bad_msgs = parser_messages(bytes(bad), events, 0, 1)
    assert _balance(bad_sum, bad_msgs) == Fp4(0)


def test_tampered_registers_detected():
    stream, events = _mini_session()
    trace, perm, bus_sum = _build(stream, events)
    for name in ("plive", "isgs", "crems", "eids", "dirc"):
        bad = trace.copy()
        row = trace.shape[0] // 3
        col = LAYOUT[name].start
        bad[row, col] = (int(bad[row, col]) + 1) % P
        assert check_trace(AIR, bad, bus_sum, perm_trace=perm,
                           challenges=CHALLENGES), f"{name} undetected"


def test_truncated_parse_detected():
    """Marking real tape bytes as SHA padding (hiding trailing records)
    violates the padding-format constraints."""
    stream, events = _mini_session()
    trace, perm, bus_sum = _build(stream, events)
    bad = trace.copy()
    # claim the tape ends 64 bytes early
    tape_len = len(stream)
    for r in range(tape_len - 64, tape_len):
        bad[r, LAYOUT["plive"].start] = 0
    assert check_trace(AIR, bad, bus_sum, perm_trace=perm,
                       challenges=CHALLENGES)
