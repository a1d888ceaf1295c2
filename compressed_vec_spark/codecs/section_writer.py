"""Variable-length SectionWriter: SectionHeader-based sections with rollover.

Re-expresses the reference's variable-length section machinery (reference
src/section.rs:71-80 `SectionHeader`, :83-180 `SectionWriter::add_64kb`) —
the FiloDB-histogram-column style container where each section carries its
own 5-byte header (num_bytes u16 LE, num_elements u16 LE, type u8) so a
reader can skip whole sections without decoding them.  This is the one
reference path unused by its own main (FixedSection) pipeline; it exists
for variable-length payloads (multi-row histogram blobs) that don't fit
the 256-element FixedSection shape.

Semantics kept bit-compatible with the reference:
  * header layout `<HHB`: num_bytes counts payload bytes AFTER the header
    (src/section.rs:74-78);
  * `add` calls a filler once with the writable tail and the element
    budget left in the current section; the filler either writes and
    returns (bytes_written, elements_written) or raises NotEnoughSpace,
    in which case the writer opens a fresh section and retries once with
    the full 64 KB / max_elements budget (src/section.rs:145-180);
  * a section never exceeds 65535 payload bytes or max_elements_per_sect
    elements, so u16 header fields can't overflow;
  * the writer patches the current section's header in place after every
    successful fill (src/section.rs:131-134 `update_sect_header`).

The reference's doc-test and unit tests (src/section.rs:88-101, :893-923)
are ported verbatim in tests/test_section_writer.py: a 4-byte buffer can't
even hold a header; a 20-byte buffer holds header+8 payload bytes with
cur_pos == 13.
"""

from __future__ import annotations

import struct
from typing import Callable, Iterator, Tuple

_HEADER = struct.Struct("<HHB")  # num_bytes, num_elements, typ
HEADER_LEN = _HEADER.size  # 5
MAX_SECT_BYTES = 65535


class NotEnoughSpace(ValueError):
    """Raised by a filler (or the writer) when the writable slice is too
    small — the writer reacts by rolling over to a new section, exactly
    the reference's CodingError::NotEnoughSpace control flow."""


# filler(writable: memoryview, elements_left: int) -> (bytes_written, elements_written)
Filler = Callable[[memoryview, int], Tuple[int, int]]


class SectionWriter:
    """Stateful writer of SectionHeader-based variable sections into a
    caller-provided bytearray (reference src/section.rs:102-180)."""

    def __init__(self, buf: bytearray, max_elements_per_sect: int = 256):
        if not isinstance(buf, (bytearray, memoryview)):
            raise TypeError("buf must be a mutable bytearray/memoryview")
        self._buf = memoryview(buf)
        self._cur_pos = 0          # 0 means no section initialized yet
        self._hdr_pos = 0
        self._max_elems = int(max_elements_per_sect)
        self._num_bytes = 0
        self._num_elems = 0
        self._typ = 0

    @property
    def cur_pos(self) -> int:
        return self._cur_pos

    def _patch_header(self) -> None:
        if self._hdr_pos + HEADER_LEN > len(self._buf):
            raise NotEnoughSpace("no room for section header")
        _HEADER.pack_into(self._buf, self._hdr_pos,
                          self._num_bytes, self._num_elems, self._typ)

    def _init_section(self, sect_type: int) -> None:
        self._num_bytes = 0
        self._num_elems = 0
        self._typ = int(sect_type)
        self._hdr_pos = self._cur_pos
        self._patch_header()
        self._cur_pos += HEADER_LEN

    def add(self, sect_type: int, filler: Filler) -> Tuple[int, int]:
        """Fill up to 64 KB into the current section via `filler`,
        rolling to a new section once on NotEnoughSpace (the reference's
        `add_64kb`, src/section.rs:145-180)."""
        if self._cur_pos == 0:
            self._init_section(sect_type)
        elements_left = self._max_elems - self._num_elems
        bytes_left = min(MAX_SECT_BYTES - self._num_bytes,
                         len(self._buf) - self._cur_pos)
        try:
            if elements_left <= 0 or bytes_left <= 0:
                raise NotEnoughSpace("section full")
            writable = self._buf[self._cur_pos:self._cur_pos + bytes_left]
            nb, ne = filler(writable, elements_left)
        except NotEnoughSpace:
            # open a fresh section, then retry exactly once (the
            # reference recurses; a second failure propagates)
            self._init_section(sect_type)
            elements_left = self._max_elems
            bytes_left = min(MAX_SECT_BYTES, len(self._buf) - self._cur_pos)
            if bytes_left <= 0:
                raise
            writable = self._buf[self._cur_pos:self._cur_pos + bytes_left]
            nb, ne = filler(writable, elements_left)
        if ne > elements_left:
            raise ValueError("filler wrote more elements than budget")
        self._num_bytes += nb
        self._num_elems += ne
        self._cur_pos += nb
        self._patch_header()
        return nb, ne

    def add_bytes(self, sect_type: int, payload: bytes,
                  num_elements: int) -> Tuple[int, int]:
        """Convenience: append one opaque payload as `num_elements`
        elements, rolling sections as needed."""
        def fill(writable: memoryview, elements_left: int) -> Tuple[int, int]:
            if len(payload) > len(writable) or num_elements > elements_left:
                raise NotEnoughSpace
            writable[:len(payload)] = payload
            return len(payload), num_elements
        return self.add(sect_type, fill)

    def finish(self) -> bytes:
        return bytes(self._buf[:self._cur_pos])


def iter_sections(buf: bytes) -> Iterator[Tuple[int, int, memoryview]]:
    """Walk a variable-section stream yielding (typ, num_elements,
    payload).  Mirrors how a SectionHeader reader skips by num_bytes
    (reference src/section.rs:71-80)."""
    view = memoryview(buf)
    pos = 0
    while pos + HEADER_LEN <= len(view):
        num_bytes, num_elements, typ = _HEADER.unpack_from(view, pos)
        payload = view[pos + HEADER_LEN:pos + HEADER_LEN + num_bytes]
        if len(payload) != num_bytes:
            raise ValueError("truncated section payload")
        yield typ, num_elements, payload
        pos += HEADER_LEN + num_bytes
    if pos != len(view):
        raise ValueError("trailing bytes after last section")
