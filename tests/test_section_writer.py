"""Variable-length SectionWriter: ported reference tests + rollover props.

Golden behaviors ported from reference src/section.rs:88-101 (doc-test) and
:893-923 (unit tests): header is 5 bytes, cur_pos lands at 13 after an
8-byte fill, and a buffer too small for even a header errors out.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from compressed_vec_spark.codecs.section_writer import (
    HEADER_LEN, MAX_SECT_BYTES, NotEnoughSpace, SectionWriter, iter_sections,
)
from compressed_vec_spark.sections import SECT_NULL, SECT_NP_MED


def _fill8(writable, _elements_left):
    if len(writable) < 8:
        raise NotEnoughSpace
    writable[:8] = b"\xff" * 8
    return 8, 8


def test_sectwriter_cannot_add_sect_header():
    # reference src/section.rs:893-906 — 4 bytes can't hold a 5-byte header
    buf = bytearray(4)
    writer = SectionWriter(buf, 256)
    with pytest.raises(NotEnoughSpace):
        writer.add(SECT_NULL, _fill8)


def test_sectwriter_fill_section_normal():
    # reference src/section.rs:908-923 — 5-byte header + 8 payload bytes
    buf = bytearray(20)
    writer = SectionWriter(buf, 256)
    assert writer.add(SECT_NULL, _fill8) == (8, 8)
    assert writer.cur_pos == 13
    # header was patched in place: num_bytes=8, num_elements=8, typ=Null
    assert struct.unpack_from("<HHB", buf, 0) == (8, 8, SECT_NULL)
    assert bytes(buf[5:13]) == b"\xff" * 8


def test_rollover_on_element_cap():
    # max 8 elements/section: a second 8-element fill must open section 2
    buf = bytearray(64)
    writer = SectionWriter(buf, 8)

    def fill(writable, elements_left):
        if elements_left < 8 or len(writable) < 8:
            raise NotEnoughSpace
        writable[:8] = bytes(range(8))
        return 8, 8

    writer.add(SECT_NP_MED, fill)
    writer.add(SECT_NP_MED, fill)
    sects = list(iter_sections(writer.finish()))
    assert [(t, n, bytes(p)) for t, n, p in sects] == [
        (SECT_NP_MED, 8, bytes(range(8))),
        (SECT_NP_MED, 8, bytes(range(8))),
    ]


def test_rollover_on_byte_budget():
    # section 1 consumes 65530 of its u16 byte budget; a 10-byte fill no
    # longer fits the section (5 left) but DOES fit a fresh one -> rollover
    buf = bytearray(MAX_SECT_BYTES + 2 * HEADER_LEN + 64)
    writer = SectionWriter(buf, 1 << 30)

    def fill(n):
        def filler(writable, _):
            if len(writable) < n:
                raise NotEnoughSpace
            writable[:n] = b"x" * n
            return n, 1
        return filler

    writer.add(SECT_NULL, fill(65530))
    writer.add(SECT_NULL, fill(10))
    sects = list(iter_sections(writer.finish()))
    assert [(n, len(p)) for _, n, p in sects] == [(1, 65530), (1, 10)]


def test_second_failure_propagates():
    buf = bytearray(HEADER_LEN + 4)  # room for one header + 4 bytes only
    writer = SectionWriter(buf, 256)
    with pytest.raises(NotEnoughSpace):
        writer.add(SECT_NULL, _fill8)


def test_section_byte_field_never_overflows():
    # a single section's payload is capped at 65535 so u16 holds
    buf = bytearray(2 * MAX_SECT_BYTES)
    writer = SectionWriter(buf, 1 << 30)

    def fill_big(writable, _):
        n = min(len(writable), 40000)
        writable[:n] = b"z" * n
        return n, 1

    writer.add(SECT_NULL, fill_big)     # 40000 into section 1
    writer.add(SECT_NULL, fill_big)     # only 25535 budget left in u16
    writer.add(SECT_NULL, fill_big)     # section 1 full -> rolls to sect 2
    sects = list(iter_sections(writer.finish()))
    assert all(len(p) <= MAX_SECT_BYTES for _, _, p in sects)
    assert [len(p) for _, _, p in sects] == [MAX_SECT_BYTES, 40000]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=300), min_size=0, max_size=40),
       st.integers(min_value=1, max_value=7))
def test_add_bytes_roundtrip(payloads, max_elems):
    total = sum(len(p) for p in payloads)
    buf = bytearray(total + (len(payloads) + 1) * HEADER_LEN + 64)
    writer = SectionWriter(buf, max_elems)
    for p in payloads:
        writer.add_bytes(SECT_NP_MED, p, 1)
    out = []
    for typ, n, payload in iter_sections(writer.finish()):
        assert typ == SECT_NP_MED or n == 0
        assert n <= max_elems
        out.append((n, bytes(payload)))
    # element counts conserve; concatenated payload bytes conserve order
    assert sum(n for n, _ in out) == len(payloads)
    assert b"".join(p for _, p in out) == b"".join(payloads)


def test_iter_sections_rejects_garbage():
    with pytest.raises(ValueError):
        list(iter_sections(b"\x08\x00\x08\x00\x00trunc"))
    with pytest.raises(ValueError):
        list(iter_sections(b"\x00\x00\x00\x00\x00" + b"\x01"))  # trailing
