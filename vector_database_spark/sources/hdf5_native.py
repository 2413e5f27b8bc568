"""Minimal pure-Python HDF5 reader/writer (no h5py, stdlib zlib).

Closes the reference's ann-benchmarks path (O27,
VectorIndex.MainTest/Program.cs:183-260) without external codec
libraries: enough of the HDF5 file format (spec v1.x,
https://docs.hdfgroup.org/hdf5/develop/_s_p_e_c.html) to read the
shape ann-benchmarks files actually use — numeric 1-D/2-D datasets,
contiguous or chunked storage, optionally gzip (deflate) and shuffle
filtered, reachable through old-style (symbol-table) or new-style
(compact link) groups.

Supported on read:
* superblock versions 0/1/2/3;
* object header versions 1 ("classic") and 2 ("OHDR"), with
  continuation blocks;
* groups: symbol-table message (v1 B-tree + SNOD + local heap) and
  compact hard-link messages; nested paths ("a/b/c");
* datasets: dataspace v1/v2, datatype classes 0 (fixed-point) and
  1 (IEEE float) little-endian, data layout v3 (compact, contiguous,
  chunked w/ v1 B-tree), filters: deflate (id 1) + shuffle (id 2).

Anything else (dense link storage, v4 layouts, BE types, szip, ...)
raises a clear error naming the unsupported feature. The writer emits
the minimal classic layout (superblock v0 + symbol-table root group +
v1 object headers, contiguous or chunked+deflate) — used for test
fixtures and as an interchange exporter.
"""

from __future__ import annotations

import struct
import zlib

UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"


class Hdf5FormatError(ValueError):
    pass


def _u(fmt, buf, off):
    return struct.unpack_from("<" + fmt, buf, off)


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        off = self._find_superblock()
        if off:
            # user block: per spec every stored address (object
            # headers, B-trees, heaps, chunks) is RELATIVE to the
            # superblock offset — re-basing the buffer makes all
            # absolute indexing below correct
            self.b = buf[off:]
            off = 0
        self._parse_superblock(off)

    def _find_superblock(self) -> int:
        off = 0
        while off < len(self.b):
            if self.b[off : off + 8] == _SIG:
                return off
            off = 512 if off == 0 else off * 2
        raise Hdf5FormatError("HDF5 signature not found")

    def _parse_superblock(self, off: int) -> None:
        v = self.b[off + 8]
        self.sb_version = v
        if v in (0, 1):
            # sizes at +13/+14
            so, sl = self.b[off + 13], self.b[off + 14]
            if (so, sl) != (8, 8):
                raise Hdf5FormatError(f"unsupported offset/length sizes {so}/{sl}")
            p = off + 24
            if v == 1:
                p += 4  # indexed storage K + reserved
            (self.base,) = _u("Q", self.b, p)
            # base, freespace, eof, driver info, then root symbol table entry
            ste = p + 32
            (self.root_oh,) = _u("Q", self.b, ste + 8)
            cache_type = _u("I", self.b, ste + 16)[0]
            self.root_stab = None
            if cache_type == 1:
                bt, hp = _u("QQ", self.b, ste + 24)
                self.root_stab = (bt, hp)
        elif v in (2, 3):
            so, sl = self.b[off + 9], self.b[off + 10]
            if (so, sl) != (8, 8):
                raise Hdf5FormatError(f"unsupported offset/length sizes {so}/{sl}")
            self.base, _ext, _eof, self.root_oh = _u("QQQQ", self.b, off + 12)
            self.root_stab = None
        else:
            raise Hdf5FormatError(f"unsupported superblock version {v}")

    # ---------------- object headers ----------------

    def messages(self, addr: int) -> list[tuple[int, bytes]]:
        """All (type, body) messages of the object header at addr."""
        b = self.b
        if b[addr : addr + 4] == b"OHDR":
            return self._messages_v2(addr)
        version = b[addr]
        if version != 1:
            raise Hdf5FormatError(f"unsupported object header version {version}")
        (nmsg,) = _u("H", b, addr + 2)
        (hsize,) = _u("I", b, addr + 8)
        out: list[tuple[int, bytes]] = []
        # v1 message block starts 8-aligned after the 12-byte prefix
        blocks = [(addr + 16, hsize)]
        while blocks and len(out) < nmsg:
            pos, remaining = blocks.pop(0)
            while remaining >= 8 and len(out) < nmsg:
                mtype, msize = _u("HH", b, pos)
                body = b[pos + 8 : pos + 8 + msize]
                pos += 8 + msize
                remaining -= 8 + msize
                if mtype == 0x10:  # continuation
                    caddr, clen = _u("QQ", body, 0)
                    blocks.append((caddr, clen))
                else:
                    out.append((mtype, body))
        return out

    def _messages_v2(self, addr: int) -> list[tuple[int, bytes]]:
        b = self.b
        flags = b[addr + 5]
        p = addr + 6
        if flags & 0x20:
            p += 16  # times
        if flags & 0x10:
            p += 4  # max compact / min dense
        size_bytes = 1 << (flags & 0x3)
        chunk0 = int.from_bytes(b[p : p + size_bytes], "little")
        p += size_bytes
        out: list[tuple[int, bytes]] = []
        # chunk 0 body runs [p, p+chunk0); trailing 4-byte checksum after
        blocks = [(p, chunk0)]
        creation_order = bool(flags & 0x4)
        while blocks:
            pos, blen = blocks.pop(0)
            end = pos + blen
            while pos + 4 <= end:
                mtype = b[pos]
                (msize,) = _u("H", b, pos + 1)
                pos += 4
                if creation_order:
                    pos += 2
                body = b[pos : pos + msize]
                pos += msize
                if mtype == 0x10:
                    caddr, clen = _u("QQ", body, 0)
                    # OCHK continuation: signature + messages + checksum
                    if b[caddr : caddr + 4] != b"OCHK":
                        raise Hdf5FormatError("bad OCHK continuation")
                    blocks.append((caddr + 4, clen - 8))
                else:
                    out.append((mtype, body))
        return out

    # ---------------- groups ----------------

    def _heap_name(self, heap_addr: int, name_off: int) -> str:
        b = self.b
        if b[heap_addr : heap_addr + 4] != b"HEAP":
            raise Hdf5FormatError("bad local heap signature")
        (data_addr,) = _u("Q", b, heap_addr + 24)
        end = b.index(b"\x00", data_addr + name_off)
        return b[data_addr + name_off : end].decode("utf-8")

    def _stab_entries(self, btree_addr: int, heap_addr: int) -> dict[str, int]:
        """name -> object header address from a v1 group B-tree."""
        b = self.b
        out: dict[str, int] = {}

        def walk(addr):
            if b[addr : addr + 4] == b"SNOD":
                (nsym,) = _u("H", b, addr + 6)
                p = addr + 8
                for _ in range(nsym):
                    name_off, oh = _u("QQ", b, p)
                    out[self._heap_name(heap_addr, name_off)] = oh
                    p += 40
                return
            if b[addr : addr + 4] != b"TREE":
                raise Hdf5FormatError("bad group B-tree signature")
            level = b[addr + 5]
            (used,) = _u("H", b, addr + 6)
            p = addr + 24  # past siblings
            p += 8  # key 0
            for _ in range(used):
                (child,) = _u("Q", b, p)
                p += 16  # child + next key
                # internal and leaf children both route through walk;
                # the SNOD/TREE signature dispatch inside walk handles
                # the level distinction
                walk(child)

        walk(btree_addr)
        return out

    def group_links(self, oh_addr: int, stab: tuple | None = None) -> dict[str, int]:
        """name -> object header address for a group."""
        if stab is not None:
            return self._stab_entries(*stab)
        links: dict[str, int] = {}
        for mtype, body in self.messages(oh_addr):
            if mtype == 0x11:  # symbol table message
                bt, hp = _u("QQ", body, 0)
                links.update(self._stab_entries(bt, hp))
            elif mtype == 0x06:  # link message
                links.update([self._parse_link(body)])
            elif mtype == 0x02:  # link info: dense storage unsupported
                fheap = _u("Q", body, 2 + (8 if body[1] & 1 else 0))[0]
                if fheap != UNDEF:
                    raise Hdf5FormatError("dense link storage not supported")
        return links

    def _parse_link(self, body: bytes) -> tuple[str, int]:
        ver, flags = body[0], body[1]
        if ver != 1:
            raise Hdf5FormatError(f"unsupported link message version {ver}")
        p = 2
        ltype = 0
        if flags & 0x8:
            ltype = body[p]
            p += 1
        if flags & 0x4:
            p += 8  # creation order
        if flags & 0x10:
            p += 1  # charset
        nlen_size = 1 << (flags & 0x3)
        nlen = int.from_bytes(body[p : p + nlen_size], "little")
        p += nlen_size
        name = body[p : p + nlen].decode("utf-8")
        p += nlen
        if ltype != 0:
            raise Hdf5FormatError("only hard links supported")
        (oh,) = _u("Q", body, p)
        return name, oh

    def resolve(self, path: str) -> int:
        """Path -> object header address."""
        links = self.group_links(self.root_oh, self.root_stab)
        parts = [p for p in path.strip("/").split("/") if p]
        for i, part in enumerate(parts):
            if part not in links:
                raise KeyError(f"no object {'/'.join(parts[: i + 1])!r} "
                               f"(has {sorted(links)})")
            oh = links[part]
            if i == len(parts) - 1:
                return oh
            links = self.group_links(oh)
        return self.root_oh

    # ---------------- datasets ----------------

    def dataset_info(self, oh_addr: int) -> dict:
        info: dict = {"filters": []}
        for mtype, body in self.messages(oh_addr):
            if mtype == 0x01:
                info["shape"] = self._parse_dataspace(body)
            elif mtype == 0x03:
                info["dtype"] = self._parse_datatype(body)
            elif mtype == 0x08:
                info["layout"] = self._parse_layout(body)
            elif mtype == 0x0B:
                info["filters"] = self._parse_filters(body)
        if "shape" not in info or "dtype" not in info or "layout" not in info:
            raise Hdf5FormatError("object is not a dataset (missing messages)")
        return info

    @staticmethod
    def _parse_dataspace(body: bytes) -> tuple[int, ...]:
        ver = body[0]
        rank = body[1]
        if ver == 1:
            p = 8
        elif ver == 2:
            p = 4
        else:
            raise Hdf5FormatError(f"unsupported dataspace version {ver}")
        return tuple(
            _u("Q", body, p + 8 * i)[0] for i in range(rank)
        )

    @staticmethod
    def _parse_datatype(body: bytes) -> str:
        cls = body[0] & 0x0F
        bits0 = body[1]
        (size,) = _u("I", body, 4)
        if bits0 & 0x1:
            raise Hdf5FormatError("big-endian datatypes not supported")
        if cls == 1:  # float
            if size == 4:
                return "<f4"
            if size == 8:
                return "<f8"
            raise Hdf5FormatError(f"unsupported float size {size}")
        if cls == 0:  # fixed-point
            signed = "i" if (bits0 & 0x8) else "u"
            if size in (1, 2, 4, 8):
                return f"<{signed}{size}"
            raise Hdf5FormatError(f"unsupported int size {size}")
        raise Hdf5FormatError(f"unsupported datatype class {cls}")

    @staticmethod
    def _parse_layout(body: bytes) -> dict:
        ver = body[0]
        if ver != 3:
            raise Hdf5FormatError(f"unsupported data layout version {ver}")
        cls = body[1]
        if cls == 0:  # compact
            (sz,) = _u("H", body, 2)
            return {"class": "compact", "data": body[4 : 4 + sz]}
        if cls == 1:  # contiguous
            addr, size = _u("QQ", body, 2)
            return {"class": "contiguous", "addr": addr, "size": size}
        if cls == 2:  # chunked, v1 btree
            dimensionality = body[2]
            (bt,) = _u("Q", body, 3)
            dims = tuple(
                _u("I", body, 11 + 4 * i)[0] for i in range(dimensionality)
            )
            return {"class": "chunked", "btree": bt, "chunk": dims}
        raise Hdf5FormatError(f"unsupported layout class {cls}")

    @staticmethod
    def _parse_filters(body: bytes) -> list[tuple[int, tuple]]:
        ver = body[0]
        n = body[1]
        out = []
        p = 8 if ver == 1 else 2
        for _ in range(n):
            fid, nlen, _flags, ncv = _u("HHHH", body, p)
            p += 8
            if ver == 1:
                p += (nlen + 7) & ~7  # v1 names are 8-byte padded
            elif fid >= 256:
                p += nlen  # v2 names are UNPADDED per spec
            cvals = tuple(_u("I", body, p + 4 * i)[0] for i in range(ncv))
            p += 4 * ncv
            if ver == 1 and (ncv % 2):
                p += 4
            out.append((fid, cvals))
        return out

    def read_dataset(self, path: str):
        import numpy as np

        info = self.dataset_info(self.resolve(path))
        shape, dtype = info["shape"], np.dtype(info["dtype"])
        layout = info["layout"]
        n_bytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize if shape else dtype.itemsize
        if layout["class"] == "compact":
            raw = layout["data"][:n_bytes]
            return np.frombuffer(raw, dtype=dtype).reshape(shape).copy()
        if layout["class"] == "contiguous":
            if layout["addr"] == UNDEF:
                return np.zeros(shape, dtype=dtype)
            raw = self.b[layout["addr"] : layout["addr"] + n_bytes]
            return np.frombuffer(raw, dtype=dtype).reshape(shape).copy()
        # chunked
        chunk = layout["chunk"][:-1]  # last entry is element size
        if len(chunk) != len(shape):
            raise Hdf5FormatError("chunk rank != dataspace rank")
        out = np.zeros(shape, dtype=dtype)
        for offsets, addr, nbytes, fmask in self._iter_chunks(layout["btree"], len(shape)):
            raw = bytes(self.b[addr : addr + nbytes])
            nf = len(info["filters"])
            for ri, (fid, cvals) in enumerate(reversed(info["filters"])):
                # filter mask: bit i set => pipeline entry i was
                # SKIPPED when this chunk was written (optional filter
                # declined) — applying it anyway would zlib-error on
                # raw bytes or unshuffle-scramble valid data
                if fmask & (1 << (nf - 1 - ri)):
                    continue
                if fid == 1:
                    raw = zlib.decompress(raw)
                elif fid == 2:
                    raw = _unshuffle(raw, cvals[0] if cvals else dtype.itemsize)
                else:
                    raise Hdf5FormatError(f"unsupported filter id {fid}")
            arr = np.frombuffer(raw, dtype=dtype)
            arr = arr[: int(np.prod(chunk))].reshape(chunk)
            sel = tuple(
                slice(o, min(o + c, s))
                for o, c, s in zip(offsets, chunk, shape)
            )
            arr_sel = tuple(slice(0, sl.stop - sl.start) for sl in sel)
            out[sel] = arr[arr_sel]
        return out

    def _iter_chunks(self, btree_addr: int, rank: int):
        b = self.b

        def walk(addr):
            if b[addr : addr + 4] != b"TREE":
                raise Hdf5FormatError("bad chunk B-tree signature")
            ntype, level = b[addr + 4], b[addr + 5]
            if ntype != 1:
                raise Hdf5FormatError("expected chunk B-tree node")
            (used,) = _u("H", b, addr + 6)
            key_size = 8 + 8 * (rank + 1)
            p = addr + 24
            for _ in range(used):
                nbytes, fmask = _u("II", b, p)
                offsets = tuple(
                    _u("Q", b, p + 8 + 8 * i)[0] for i in range(rank)
                )
                (child,) = _u("Q", b, p + key_size)
                if level > 0:
                    yield from walk(child)
                else:
                    yield offsets, child, nbytes, fmask
                p += key_size + 8

        yield from walk(btree_addr)


def _unshuffle(raw: bytes, itemsize: int) -> bytes:
    import numpy as np

    if itemsize <= 1:
        return raw
    n = len(raw) // itemsize
    a = np.frombuffer(raw[: n * itemsize], dtype=np.uint8)
    return a.reshape(itemsize, n).T.tobytes() + raw[n * itemsize :]


def read_hdf5_dataset(path: str, dataset: str):
    """Read a numeric dataset from an HDF5 file — pure Python + numpy."""
    with open(path, "rb") as f:
        return _Reader(f.read()).read_dataset(dataset)


def list_hdf5(path: str) -> list[str]:
    """Names of the root group's members."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    return sorted(r.group_links(r.root_oh, r.root_stab))


# --------------------------------------------------------------------------
# writer (classic minimal layout) — test fixtures + interchange export
# --------------------------------------------------------------------------


def write_hdf5(path: str, datasets: dict, *, chunks: int | None = None,
               gzip: int | None = None) -> None:
    """Write 1-D/2-D numeric arrays as an HDF5 file (superblock v0,
    symbol-table root group, v1 object headers). ``chunks`` = rows per
    chunk enables chunked layout; ``gzip`` adds the deflate filter
    (requires ``chunks``)."""
    import numpy as np

    if gzip is not None and chunks is None:
        raise ValueError("gzip requires chunked layout (pass chunks=...)")
    names = sorted(datasets)
    arrays = {k: np.ascontiguousarray(datasets[k]) for k in names}
    for k, a in arrays.items():
        if a.dtype.byteorder == ">":
            arrays[k] = a.astype(a.dtype.newbyteorder("<"))

    buf = bytearray()

    def pad8():
        while len(buf) % 8:
            buf.append(0)

    def alloc(n: int) -> int:
        pad8()
        addr = len(buf)
        buf.extend(b"\x00" * n)
        return addr

    # ---- superblock (96 bytes, filled at the end) ----
    buf.extend(b"\x00" * 96)

    # ---- local heap data: names ----
    heap_data = bytearray(b"\x00" * 8)  # offset 0: empty string
    name_off = {}
    for k in names:
        name_off[k] = len(heap_data)
        heap_data.extend(k.encode("utf-8") + b"\x00")
        while len(heap_data) % 8:
            heap_data.append(0)
    heap_data_addr = alloc(len(heap_data))
    buf[heap_data_addr : heap_data_addr + len(heap_data)] = heap_data

    heap_addr = alloc(32)
    struct.pack_into(
        "<4sB3sQQQ", buf, heap_addr, b"HEAP", 0, b"\x00" * 3,
        len(heap_data), UNDEF, heap_data_addr,
    )

    # ---- per-dataset: data + object header ----
    oh_addrs = {}
    for k in names:
        a = arrays[k]
        dt = a.dtype
        # datatype message (class 0 int / class 1 float, LE)
        if dt.kind == "f":
            cls, bits0 = 1, 0x20  # IEEE, LE, no sign loc
            if dt.itemsize == 4:
                props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
            else:
                props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
            bits0 = 0x00
            # bit field: bit0 byte order LE=0; bits: lo pad/hi pad/mantissa norm/sign
            bitfields = bytes([0x20, 0x3F if dt.itemsize == 8 else 0x1F, 0])
            # (sign location byte 2: for f8 sign bit 63, f4 sign 31 — encoded
            # in bitfield byte 2? Simplify: readers here only check class/
            # size/endianness; h5py-compatible exactness is not required
            # for our reader, and dtype properties carry the real layout.)
            dtype_msg = bytes([0x10 | cls]) + bitfields + struct.pack("<I", dt.itemsize) + props
        elif dt.kind in ("i", "u"):
            cls = 0
            bits0 = 0x08 if dt.kind == "i" else 0x00
            dtype_msg = (
                bytes([0x10 | cls, bits0, 0, 0])
                + struct.pack("<I", dt.itemsize)
                + struct.pack("<HH", 0, dt.itemsize * 8)
            )
        else:
            raise ValueError(f"unsupported dtype {dt}")

        # dataspace v1
        shape = a.shape
        ds = bytes([1, len(shape), 0, 0]) + b"\x00" * 4 + b"".join(
            struct.pack("<Q", s) for s in shape
        )

        filt_msg = None
        if chunks is None:
            data_addr = alloc(a.nbytes)
            buf[data_addr : data_addr + a.nbytes] = a.tobytes()
            layout = bytes([3, 1]) + struct.pack("<QQ", data_addr, a.nbytes)
        else:
            rank = len(shape)
            chunk_shape = (min(chunks, shape[0]),) + shape[1:]
            # write chunks, collect (offsets, addr, nbytes)
            entries = []
            for start in range(0, shape[0], chunk_shape[0]):
                piece = np.zeros(chunk_shape, dtype=dt)
                rows = min(chunk_shape[0], shape[0] - start)
                piece[:rows] = a[start : start + rows]
                raw = piece.tobytes()
                if gzip is not None:
                    raw = zlib.compress(raw, gzip)
                caddr = alloc(len(raw))
                buf[caddr : caddr + len(raw)] = raw
                offs = (start,) + (0,) * (rank - 1) + (0,)
                entries.append((offs, caddr, len(raw)))
            # single level-0 chunk btree node
            key_size = 8 + 8 * (rank + 1)
            node_size = 24 + len(entries) * (key_size + 8) + key_size
            bt_addr = alloc(node_size)
            struct.pack_into("<4sBBHQQ", buf, bt_addr, b"TREE", 1, 0,
                            len(entries), UNDEF, UNDEF)
            p = bt_addr + 24
            for offs, caddr, nb in entries:
                struct.pack_into("<II", buf, p, nb, 0)
                for i, o in enumerate(offs):
                    struct.pack_into("<Q", buf, p + 8 + 8 * i, o)
                struct.pack_into("<Q", buf, p + key_size, caddr)
                p += key_size + 8
            # final key: one past the end in the slowest dimension
            struct.pack_into("<II", buf, p, 0, 0)
            end_off = (shape[0] + chunk_shape[0] - 1) // chunk_shape[0] * chunk_shape[0]
            final = (end_off,) + (0,) * (rank - 1) + (0,)
            for i, o in enumerate(final):
                struct.pack_into("<Q", buf, p + 8 + 8 * i, o)
            layout = (
                bytes([3, 2, rank + 1])
                + struct.pack("<Q", bt_addr)
                + b"".join(struct.pack("<I", c) for c in chunk_shape)
                + struct.pack("<I", dt.itemsize)
            )
            if gzip is not None:
                # filter pipeline v1: deflate with one client value
                filt_msg = (
                    bytes([1, 1]) + b"\x00" * 6
                    + struct.pack("<HHHH", 1, 0, 1, 1)
                    + struct.pack("<I", gzip) + b"\x00" * 4
                )

        msgs = [(0x01, ds), (0x03, dtype_msg)]
        if filt_msg is not None:
            msgs.append((0x0B, filt_msg))
        msgs.append((0x08, layout))
        body = bytearray()
        for mtype, mbody in msgs:
            mb = bytes(mbody)
            while len(mb) % 8:
                mb += b"\x00"
            body += struct.pack("<HHB3s", mtype, len(mb), 0, b"\x00" * 3) + mb
        oh_addr = alloc(16 + len(body))
        struct.pack_into("<BBHII", buf, oh_addr, 1, 0, len(msgs), 1, len(body))
        buf[oh_addr + 16 : oh_addr + 16 + len(body)] = body
        oh_addrs[k] = oh_addr

    # ---- SNOD with all symbols (names pre-sorted) ----
    snod_addr = alloc(8 + 40 * len(names))
    struct.pack_into("<4sBBH", buf, snod_addr, b"SNOD", 1, 0, len(names))
    p = snod_addr + 8
    for k in names:
        struct.pack_into("<QQI", buf, p, name_off[k], oh_addrs[k], 0)
        p += 40

    # ---- group btree: one leaf entry pointing at the SNOD ----
    bt_addr = alloc(24 + 8 + 8 + 8)
    struct.pack_into("<4sBBHQQ", buf, bt_addr, b"TREE", 0, 0, 1, UNDEF, UNDEF)
    struct.pack_into("<QQQ", buf, bt_addr + 24, 0, snod_addr,
                     name_off[names[-1]] if names else 0)

    # ---- root group object header: symbol table message ----
    stab = struct.pack("<QQ", bt_addr, heap_addr)
    body = struct.pack("<HHB3s", 0x11, len(stab), 0, b"\x00" * 3) + stab
    root_oh = alloc(16 + len(body))
    struct.pack_into("<BBHII", buf, root_oh, 1, 0, 1, 1, len(body))
    buf[root_oh + 16 : root_oh + 16 + len(body)] = body

    # ---- superblock ----
    struct.pack_into(
        "<8sBBBBBBBBHHIQQQQ", buf, 0, _SIG, 0, 0, 0, 0, 0, 8, 8, 0,
        4, 16, 0, 0, UNDEF, len(buf), UNDEF,
    )
    # root symbol table entry at offset 72 (after 24 header + 32 addrs... )
    ste = 0 + 24 + 32
    struct.pack_into("<QQI4xQQ", buf, ste, 0, root_oh, 1, bt_addr, heap_addr)

    with open(path, "wb") as f:
        f.write(bytes(buf))
