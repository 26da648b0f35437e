"""Route Z executor: RV32IM semantics against hand-assembled programs and
a synthetic ELF image (the released zktls guest ELFs need network —
SURVEY.md §2.2.A; this validates the executor they will run on)."""

import struct

import pytest

from zktls_tpu.routez import Machine, run_elf
from zktls_tpu.routez.executor import Halt

# --- a tiny RV32IM assembler (encoders only, for test programs) -----------


def r_type(op, rd, f3, rs1, rs2, f7):
    return f7 << 25 | rs2 << 20 | rs1 << 15 | f3 << 12 | rd << 7 | op


def i_type(op, rd, f3, rs1, imm):
    return (imm & 0xFFF) << 20 | rs1 << 15 | f3 << 12 | rd << 7 | op


def s_type(op, f3, rs1, rs2, imm):
    imm &= 0xFFF
    return ((imm >> 5) << 25 | rs2 << 20 | rs1 << 15 | f3 << 12
            | (imm & 0x1F) << 7 | op)


def b_type(f3, rs1, rs2, imm):
    imm &= 0x1FFF
    return ((imm >> 12) << 31 | ((imm >> 5) & 0x3F) << 25 | rs2 << 20
            | rs1 << 15 | f3 << 12 | ((imm >> 1) & 0xF) << 8
            | ((imm >> 11) & 1) << 7 | 0x63)


def lui(rd, imm20):
    return (imm20 & 0xFFFFF) << 12 | rd << 7 | 0x37


def addi(rd, rs1, imm):
    return i_type(0x13, rd, 0, rs1, imm)


def add(rd, rs1, rs2):
    return r_type(0x33, rd, 0, rs1, rs2, 0)


def mul(rd, rs1, rs2):
    return r_type(0x33, rd, 0, rs1, rs2, 1)


def divu(rd, rs1, rs2):
    return r_type(0x33, rd, 5, rs1, rs2, 1)


def rem(rd, rs1, rs2):
    return r_type(0x33, rd, 6, rs1, rs2, 1)


def sw(rs1, rs2, imm):
    return s_type(0x23, 2, rs1, rs2, imm)


def lw(rd, rs1, imm):
    return i_type(0x03, rd, 2, rs1, imm)


def bne(rs1, rs2, imm):
    return b_type(1, rs1, rs2, imm)


ECALL = 0x00000073


def run_program(words, pc=0x1000, max_cycles=1 << 20):
    m = Machine()
    m.store_bytes(pc, b"".join(struct.pack("<I", w) for w in words))
    m.pc = pc
    code = m.run(max_cycles=max_cycles)
    return code, m


def test_sum_loop():
    # sum 1..100 into a1, exit code in a0
    prog = [
        addi(5, 0, 100),      # t0 = 100
        addi(11, 0, 0),       # a1 = 0
        add(11, 11, 5),       # a1 += t0
        addi(5, 5, -1),       # t0 -= 1
        bne(5, 0, -8),        # loop
        addi(10, 11, 0),      # a0 = a1
        ECALL,
    ]
    code, m = run_program(prog)
    assert code == 5050
    assert m.cycles == 2 + 3 * 100 + 2


def test_mul_div_rem_edge_cases():
    prog = [
        addi(5, 0, -7),
        addi(6, 0, 3),
        mul(10, 5, 6),         # -21
        rem(11, 5, 6),         # -7 % 3 -> -1 (toward zero)
        divu(12, 5, 0),        # div by zero -> all ones
        ECALL,
    ]
    code, m = run_program(prog)
    assert code == (-21) & 0xFFFFFFFF
    assert m.regs[11] == (-1) & 0xFFFFFFFF
    assert m.regs[12] == 0xFFFFFFFF


def test_memory_roundtrip_and_pages():
    prog = [
        lui(5, 0x10),           # t0 = 0x10000
        addi(6, 0, 1234),
        sw(5, 6, 0),            # [0x10000] = 1234
        lw(10, 5, 0),           # a0 = [0x10000]
        ECALL,
    ]
    code, m = run_program(prog)
    assert code == 1234
    # cross-page store/load
    m2 = Machine()
    m2.store_bytes(0xFFE, b"\x11\x22\x33\x44\x55\x66")
    assert m2.load_bytes(0xFFE, 6) == b"\x11\x22\x33\x44\x55\x66"


def test_segment_accounting():
    prog = [addi(5, 0, 50), addi(5, 5, -1), bne(5, 0, -4), ECALL]
    m = Machine(segment_cycles=16)
    m.store_bytes(0, b"".join(struct.pack("<I", w) for w in prog))
    with pytest.raises(Halt):
        while True:
            m.step()
    assert m.segments and all(s % 16 == 0 for s in m.segments)


def _wrap_elf(words, entry=0x1000):
    """A minimal one-segment ELF32 RISC-V image."""
    body = b"".join(struct.pack("<I", w) for w in words)
    ehsize, phentsize = 52, 32
    e_phoff = ehsize
    p_offset = ehsize + phentsize
    hdr = (b"\x7fELF" + bytes([1, 1, 1, 0]) + b"\x00" * 8
           + struct.pack("<HHIIIIIHHHHHH",
                         2, 243, 1, entry, e_phoff, 0, 0, ehsize,
                         phentsize, 1, 0, 0, 0))
    ph = struct.pack("<IIIIIIII", 1, p_offset, entry, entry,
                     len(body), len(body) + 64, 7, 4)
    return hdr + ph + body


def test_run_elf():
    prog = [addi(10, 0, 42), ECALL]
    code, m = run_elf(_wrap_elf(prog))
    assert code == 42
    assert m.cycles == 2


def test_run_elf_rejects_non_riscv():
    bad = bytearray(_wrap_elf([ECALL]))
    bad[18] = 62  # EM_X86_64
    with pytest.raises(ValueError, match="RISC-V"):
        run_elf(bytes(bad))
