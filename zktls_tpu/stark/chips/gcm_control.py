"""GCM control AIR chip — the per-record accounting table that glues the
AES-128 and GHASH chips to the journal's record headers.

The reference proves AES-GCM record decryption as straight-line guest code
whose control flow is part of the proven execution (SURVEY.md §3.4); here
the equivalent wiring is explicit bus messages (stark/bus.py):

  row types per GCM event (one decrypted record):
    header row (rt0): RECEIVES the journal's record header
        (BUS_GCM_RECORD: eid, nonce, tag, n_blocks) — sent by the VERIFIER
        from public journal data — and the AES encryption of the zero
        block (BUS_AES_ENC with input 0 → output H), then SENDS the GHASH
        key H (BUS_GCM_H) to the GHASH chip, and RECEIVES the tag the
        GHASH chip computed (BUS_GCM_TAG) against the journal's tag.
    J0 row (rt1): RECEIVES E_K(J0) (BUS_AES_ENC, input = nonce‖1) and
        SENDS it as the tag-whitening mask (BUS_GCM_MASK) to GHASH.
    counter rows: RECEIVE one keystream block each (BUS_AES_ENC with
        input = the 32-bit-incremented counter — increment constrained
        in-chip), counted against the header's n_blocks.

So: the journal pins (nonce, tag, n_blocks) per record; the AES chip pins
key/input/output of every block encryption; GHASH pins S and tag = S ⊕
mask.  Tampering any AES counter block, the GHASH key, the mask, the tag,
or any journal record field breaks the global bus balance.

Remaining gap (round-3, with the record-parser chip): binding the
ciphertext blocks entering GHASH and the plaintext bytes to the committed
TLS stream — today those are constrained only through the tag equation.
"""

from __future__ import annotations

import numpy as np

from ..air import Air, AirBuilder
from ..bus import (
    BUS_AES_ENC,
    BUS_GCM_H,
    BUS_GCM_MASK,
    BUS_GCM_RECORD,
    BUS_GCM_TAG,
    np_bus_inverse_terms,
)
from ..ext_val import ExtVal

__all__ = ["GcmControlAir", "gcm_control_trace", "pack_gcm_records",
           "parse_gcm_records", "GCM_RECORD_SIZE"]

P = 2013265921

#: journal wire format of one record header:
#: u16 eid ‖ 12-byte nonce ‖ 16-byte tag ‖ u16 n_blocks
GCM_RECORD_SIZE = 32


class _Layout:
    def __init__(self):
        self._n = 0
        self.slices: dict[str, slice] = {}

    def add(self, name: str, count: int) -> None:
        self.slices[name] = slice(self._n, self._n + count)
        self._n += count

    @property
    def width(self) -> int:
        return self._n

    def __getitem__(self, name: str) -> slice:
        return self.slices[name]


def _build_layout() -> _Layout:
    L = _Layout()
    L.add("rt0", 1)      # header row flag
    L.add("rt1", 1)      # J0 row flag
    L.add("live", 1)     # 1 on real event rows, 0 on padding
    L.add("eid", 1)      # event id (constant through the event)
    L.add("key", 8)      # AES key limbs (event-constant)
    L.add("ctr", 8)      # this row's AES input block limbs
    L.add("out", 8)      # this row's AES output block limbs
    L.add("tag", 8)      # record tag limbs (event-constant)
    L.add("nonce", 6)    # record nonce limbs (event-constant)
    L.add("nblocks", 1)  # record keystream block count (event-constant)
    L.add("cnt", 1)      # running counter-row count
    L.add("c0", 1)       # inc32 carry bits (into this row's ctr)
    L.add("c1", 1)
    return L


LAYOUT = _build_layout()


class GcmControlAir(Air):
    width = LAYOUT.width
    num_public = 0
    max_constraint_degree = 3
    #: inv_aes ‖ inv_h ‖ inv_mask ‖ inv_rec ‖ inv_tag ‖ u ‖ acc
    perm_width = 28
    num_perm_challenges = 2
    has_bus = True

    def eval(self, b: AirBuilder) -> None:
        L = LAYOUT

        def loc(name, i=0):
            return b.local[L[name].start + i]

        def nxt(name, i=0):
            return b.next[L[name].start + i]

        rt0, rt1, live = loc("rt0"), loc("rt1"), loc("live")
        nrt0, nrt1 = nxt("rt0"), nxt("rt1")
        for c in (rt0, rt1, live, loc("c0"), loc("c1")):
            b.assert_bool(c)
        b.assert_zero(rt0 * rt1)
        # row sequencing: header → J0; J0 only after a header
        b.when_transition(rt0 * (1 - nrt1))
        b.when_transition((1 - rt0) * nrt1)
        b.when_first_row(rt1)

        # event-constant columns (free only across a header boundary);
        # degree 3: is_transition · (1 − rt0') · Δ
        ev_const = [("eid", 1), ("key", 8), ("tag", 8), ("nonce", 6),
                    ("nblocks", 1), ("live", 1)]
        for name, k in ev_const:
            grp = b.local_group(L[name])
            ngrp = b.next_group(L[name])
            b.assert_zero_vec(b.is_transition * ((1 - nrt0) * (ngrp - grp)),
                              k)

        # header row: AES input is the zero block
        for j in range(8):
            b.assert_zero(rt0 * loc("ctr", j))
        # J0 row: ctr = nonce ‖ 0x0000 ‖ 0x0001
        for j in range(6):
            b.assert_zero(rt1 * (loc("ctr", j) - loc("nonce", j)))
        b.assert_zero(rt1 * loc("ctr", 6))
        b.assert_zero(rt1 * (loc("ctr", 7) - 1))

        # counter rows: inc32 from the previous row's ctr (covers J0 → ctr0
        # and ctr_i → ctr_{i+1}); the low 32 bits live in limbs 6 (hi), 7 (lo)
        g_inc = (1 - nrt0 - nrt1)  # next row is a counter row
        c0n, c1n = nxt("c0"), nxt("c1")
        b.when_transition(
            g_inc * (nxt("ctr", 7) - loc("ctr", 7) - 1 + c0n * 65536))
        b.when_transition(
            g_inc * (nxt("ctr", 6) - loc("ctr", 6) - c0n + c1n * 65536))
        for j in range(6):
            b.when_transition(g_inc * (nxt("ctr", j) - loc("ctr", j)))
        # block counting against the journal's n_blocks
        b.assert_zero(rt1 * loc("cnt"))
        b.when_transition(g_inc * (nxt("cnt") - loc("cnt") - 1))
        b.when_transition(nrt0 * (loc("cnt") - loc("nblocks")))
        b.when_last_row(loc("cnt") - loc("nblocks"))

        # --- bus messages ---
        gamma = b.challenges[0]

        def dpow(i):
            return b.challenges[1 + i]

        eid = loc("eid")
        fp_aes = ExtVal.from_base(BUS_AES_ENC) + dpow(0) * eid
        fp_h = ExtVal.from_base(BUS_GCM_H) + dpow(0) * eid
        fp_mask = ExtVal.from_base(BUS_GCM_MASK) + dpow(0) * eid
        fp_tag = ExtVal.from_base(BUS_GCM_TAG) + dpow(0) * eid
        fp_rec = ExtVal.from_base(BUS_GCM_RECORD) + dpow(0) * eid
        for j in range(8):
            fp_aes = fp_aes + dpow(1 + j) * loc("key", j) \
                + dpow(9 + j) * loc("ctr", j) + dpow(17 + j) * loc("out", j)
            fp_h = fp_h + dpow(1 + j) * loc("out", j)
            fp_mask = fp_mask + dpow(1 + j) * loc("out", j)
            fp_tag = fp_tag + dpow(1 + j) * loc("tag", j)
            fp_rec = fp_rec + dpow(7 + j) * loc("tag", j)
        for j in range(6):
            fp_rec = fp_rec + dpow(1 + j) * loc("nonce", j)
        fp_rec = fp_rec + dpow(15) * loc("nblocks")

        inv_aes = b.perm_ext(0)
        inv_h = b.perm_ext(1)
        inv_mask = b.perm_ext(2)
        inv_rec = b.perm_ext(3)
        inv_tag = b.perm_ext(4)
        u = b.perm_ext(5)
        acc = b.perm_ext(6)
        u_n = b.perm_ext(5, nxt=True)
        acc_n = b.perm_ext(6, nxt=True)
        b.assert_ext_zero(inv_aes * (gamma - fp_aes) - 1)
        b.assert_ext_zero(inv_h * (gamma - fp_h) - 1)
        b.assert_ext_zero(inv_mask * (gamma - fp_mask) - 1)
        b.assert_ext_zero(inv_rec * (gamma - fp_rec) - 1)
        b.assert_ext_zero(inv_tag * (gamma - fp_tag) - 1)
        # receives: every live row one AES block; header row the journal
        # record + the GHASH tag.  sends: H (header), mask (J0 row).
        u_def = ((inv_h - inv_rec - inv_tag) * rt0 + inv_mask * rt1) * 1
        u_def = (u_def - inv_aes) * live
        b.assert_ext_zero(u - u_def)
        b.assert_ext_zero((acc - u) * b.is_first_row)
        b.assert_ext_zero((acc_n - acc - u_n) * b.is_transition)
        for ell in range(4):
            b.when_last_row(acc.c[ell] - b.public[ell])

    # ------------------------------------------------------------------

    def generate_perm_trace(self, main, publics, challenges):
        L = LAYOUT
        n = main.shape[0]

        def cols(name):
            return main[:, L[name]].astype(np.uint64)

        eid = cols("eid")
        key, ctr, out = cols("key"), cols("ctr"), cols("out")
        tag, nonce, nblocks = cols("tag"), cols("nonce"), cols("nblocks")
        inv_aes = np_bus_inverse_terms(
            challenges, BUS_AES_ENC,
            np.concatenate([eid, key, ctr, out], axis=1))
        inv_h = np_bus_inverse_terms(
            challenges, BUS_GCM_H, np.concatenate([eid, out], axis=1))
        inv_mask = np_bus_inverse_terms(
            challenges, BUS_GCM_MASK, np.concatenate([eid, out], axis=1))
        inv_rec = np_bus_inverse_terms(
            challenges, BUS_GCM_RECORD,
            np.concatenate([eid, nonce, tag, nblocks], axis=1))
        inv_tag = np_bus_inverse_terms(
            challenges, BUS_GCM_TAG, np.concatenate([eid, tag], axis=1))
        rt0 = cols("rt0")
        rt1 = cols("rt1")
        live = cols("live")
        u = (inv_h.astype(np.uint64)
             + 2 * P - inv_rec.astype(np.uint64)
             - inv_tag.astype(np.uint64)) % P
        u = (u * rt0 + inv_mask.astype(np.uint64) * rt1) % P
        u = ((u + P - inv_aes.astype(np.uint64)) % P) * live % P
        acc = np.cumsum(u, axis=0) % P
        return np.concatenate(
            [inv_aes, inv_h, inv_mask, inv_rec, inv_tag, u, acc], axis=1
        ).astype(np.uint32)


# ---------------------------------------------------------------------------
# witness generation + journal record packing
# ---------------------------------------------------------------------------


def _limbs(data: bytes) -> list[int]:
    return [int.from_bytes(data[i : i + 2], "big")
            for i in range(0, len(data), 2)]


def pack_gcm_records(events) -> bytes:
    """Journal wire format of the record headers: 32 bytes per event
    (u16 eid ‖ nonce ‖ tag ‖ u16 n_blocks)."""
    out = bytearray()
    for eid, ev in enumerate(events):
        n_blocks = len(ev.counter_blocks)
        out += eid.to_bytes(2, "big") + ev.nonce + ev.tag \
            + n_blocks.to_bytes(2, "big")
    return bytes(out)


def parse_gcm_records(data: bytes) -> list[dict]:
    if len(data) % GCM_RECORD_SIZE:
        raise ValueError("bad gcm_records length")
    out = []
    for i in range(0, len(data), GCM_RECORD_SIZE):
        rec = data[i : i + GCM_RECORD_SIZE]
        out.append({
            "eid": int.from_bytes(rec[0:2], "big"),
            "nonce": rec[2:14],
            "tag": rec[14:30],
            "n_blocks": int.from_bytes(rec[30:32], "big"),
        })
    return out


def gcm_control_trace(events, min_log_n: int = 6):
    """Build the control trace from recorded GCMEvents (eid = list index).
    Returns (trace (n, width) uint32, [])."""
    if not events:
        raise ValueError("need at least one event")
    L = LAYOUT
    rows: list[dict] = []
    for eid, ev in enumerate(events):
        key_l = _limbs(ev.key)
        tag_l = _limbs(ev.tag)
        nonce_l = _limbs(ev.nonce)
        nb = len(ev.counter_blocks)
        base = dict(eid=eid, key=key_l, tag=tag_l, nonce=nonce_l,
                    nblocks=nb, live=1)
        rows.append(dict(base, rt0=1, rt1=0, cnt=0,
                         ctr=[0] * 8, out=_limbs(ev.h_block)))
        j0 = ev.nonce + b"\x00\x00\x00\x01"
        rows.append(dict(base, rt0=0, rt1=1, cnt=0,
                         ctr=_limbs(j0), out=_limbs(ev.j0_mask)))
        for i, (cb, ks) in enumerate(zip(ev.counter_blocks, ev.keystream)):
            rows.append(dict(base, rt0=0, rt1=0, cnt=i + 1,
                             ctr=_limbs(cb), out=_limbs(ks)))

    n_real = len(rows)
    log_n = max(min_log_n, (n_real - 1).bit_length())
    n = 1 << log_n
    pad = n - n_real
    # padding rows are silent counter rows with ctr = 0,1,2,… and
    # nblocks = cnt(last pad) so the end-check at the first header passes
    pad_rows = []
    for i in range(pad):
        ctr_l = [0] * 6 + [i >> 16, i & 0xFFFF]
        c0 = 1 if i and (i - 1) & 0xFFFF == 0xFFFF else 0
        pad_rows.append(dict(eid=0, key=[0] * 8, tag=[0] * 8,
                             nonce=[0] * 6, nblocks=max(pad - 1, 0),
                             live=0, rt0=0, rt1=0, cnt=i,
                             ctr=ctr_l, out=[0] * 8, c0=c0, c1=0))
    rows = pad_rows + rows

    trace = np.zeros((n, L.width), dtype=np.uint32)
    for r, row in enumerate(rows):
        trace[r, L["rt0"].start] = row["rt0"]
        trace[r, L["rt1"].start] = row["rt1"]
        trace[r, L["live"].start] = row["live"]
        trace[r, L["eid"].start] = row["eid"]
        trace[r, L["nblocks"].start] = row["nblocks"]
        trace[r, L["cnt"].start] = row["cnt"]
        for j in range(8):
            trace[r, L["key"].start + j] = row["key"][j]
            trace[r, L["ctr"].start + j] = row["ctr"][j]
            trace[r, L["out"].start + j] = row["out"][j]
            trace[r, L["tag"].start + j] = row["tag"][j]
        for j in range(6):
            trace[r, L["nonce"].start + j] = row["nonce"][j]
        # inc32 carries into this row (meaningful only on counter rows
        # that follow another row; harmless elsewhere)
        if "c0" in row:
            trace[r, L["c0"].start] = row["c0"]
            trace[r, L["c1"].start] = row["c1"]
        elif r > 0 and row["rt0"] == 0 and row["rt1"] == 0:
            prev = rows[r - 1]
            lo_prev = prev["ctr"][7]
            c0 = 1 if lo_prev == 0xFFFF else 0
            c1 = 1 if c0 and prev["ctr"][6] == 0xFFFF else 0
            trace[r, L["c0"].start] = c0
            trace[r, L["c1"].start] = c1
    return trace, []
