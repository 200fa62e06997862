"""PCD I/O: round-trip, ASCII/binary parity, PCL-header compatibility."""

import io

import numpy as np
import pytest

from semicp.data.pcd import load_pcd, save_pcd, _parse_header


@pytest.fixture
def cloud():
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(257, 3)).astype(np.float32)
    lab = rng.integers(0, 20, size=257).astype(np.int32)
    return xyz, lab


@pytest.mark.parametrize("binary", [True, False])
def test_roundtrip_xyzl(tmp_path, cloud, binary):
    xyz, lab = cloud
    p = tmp_path / "c.pcd"
    save_pcd(p, xyz, lab, binary=binary)
    x2, l2 = load_pcd(p)
    assert l2 is not None
    np.testing.assert_array_equal(l2, lab)
    tol = 0 if binary else 1e-5
    np.testing.assert_allclose(x2, xyz, atol=tol)


def test_roundtrip_unlabeled(tmp_path, cloud):
    xyz, _ = cloud
    p = tmp_path / "c.pcd"
    save_pcd(p, xyz)
    x2, l2 = load_pcd(p)
    assert l2 is None
    np.testing.assert_array_equal(x2, xyz)


def test_loads_pcl_style_ascii(tmp_path):
    """A hand-written header in PCL's own emission order/spacing."""
    body = (
        "# .PCD v.7 - Point Cloud Data file format\n"
        "VERSION .7\n"
        "FIELDS x y z label\n"
        "SIZE 4 4 4 4\n"
        "TYPE F F F U\n"
        "COUNT 1 1 1 1\n"
        "WIDTH 3\nHEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        "POINTS 3\nDATA ascii\n"
        "1.0 2.0 3.0 7\n"
        "4.5 -1.25 0.0 0\n"
        "nan nan nan 2\n"   # PCL invalid point -> dropped
    )
    p = tmp_path / "pcl.pcd"
    p.write_bytes(body.encode())
    xyz, lab = load_pcd(p)
    assert xyz.shape == (2, 3)
    np.testing.assert_allclose(xyz[0], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(lab, [7, 0])


def test_extra_fields_ignored(tmp_path):
    """Fields we don't consume (intensity, multi-count) parse cleanly."""
    body = (
        "VERSION 0.7\n"
        "FIELDS x y z intensity\n"
        "SIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 1\n"
        "WIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA ascii\n"
        "0 0 0 0.5\n1 1 1 0.25\n"
    )
    p = tmp_path / "i.pcd"
    p.write_bytes(body.encode())
    xyz, lab = load_pcd(p)
    assert lab is None
    assert xyz.shape == (2, 3)


def _lzf_compress_literals(buf: bytes) -> bytes:
    """Minimal VALID LZF stream: literal runs only (every libLZF
    decoder accepts it; PCL's own compressor just adds back-refs)."""
    out = bytearray()
    for i in range(0, len(buf), 32):
        chunk = buf[i:i + 32]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def test_binary_compressed_roundtrip(tmp_path):
    """PCL-style binary_compressed XYZL: two uint32 sizes + LZF stream
    of FIELD-MAJOR content must load identically to plain binary."""
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(37, 3)).astype(np.float32)
    lab = rng.integers(0, 6, size=37).astype(np.uint32)
    # field-major (SoA): all x, all y, all z, all label
    raw = (xyz[:, 0].tobytes() + xyz[:, 1].tobytes()
           + xyz[:, 2].tobytes() + lab.tobytes())
    comp = _lzf_compress_literals(raw)
    body = (
        "VERSION 0.7\nFIELDS x y z label\nSIZE 4 4 4 4\nTYPE F F F U\n"
        "COUNT 1 1 1 1\nWIDTH 37\nHEIGHT 1\nPOINTS 37\n"
        "DATA binary_compressed\n"
    )
    p = tmp_path / "z.pcd"
    p.write_bytes(body.encode()
                  + np.asarray([len(comp), len(raw)], np.uint32).tobytes()
                  + comp)
    pts, labels = load_pcd(p)
    np.testing.assert_allclose(pts, xyz)
    np.testing.assert_array_equal(labels, lab.astype(np.int32))


def test_lzf_back_reference_and_errors(tmp_path):
    from semicp.data.pcd import _lzf_decompress

    # literal "abc" + back-ref: ctrl = (len-2)<<5 | off_hi, then off_lo;
    # offset = (off_hi<<8) + off_lo + 1. Copy 4 bytes from 3 back ->
    # replicates "abc" overlappingly: abc + abca = "abcabca"
    stream = bytes([2]) + b"abc" + bytes([(4 - 2) << 5, 2])
    assert _lzf_decompress(stream, 7) == b"abcabca"
    with pytest.raises(ValueError, match="decompressed"):
        _lzf_decompress(stream, 9)
    with pytest.raises(ValueError, match="back-reference"):
        _lzf_decompress(bytes([1 << 5, 200]), 5)
    # truncated compressed payload surfaces loudly through load_pcd
    body = (
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        "WIDTH 1\nHEIGHT 1\nPOINTS 1\nDATA binary_compressed\n"
    )
    p = tmp_path / "t.pcd"
    p.write_bytes(body.encode()
                  + np.asarray([99, 12], np.uint32).tobytes() + b"\x00" * 4)
    with pytest.raises(ValueError, match="truncated"):
        load_pcd(p)


def test_header_parser_handles_comments_and_blank():
    raw = io.BytesIO(b"# c\n\nVERSION 0.7\nFIELDS x\nSIZE 4\nTYPE F\n"
                     b"COUNT 1\nPOINTS 1\nWIDTH 1\nHEIGHT 1\nDATA ascii\n")
    hdr = _parse_header(raw)
    assert hdr["FIELDS"] == ["x"] and hdr["DATA"] == "ascii"


def test_cli_loader_dispatches_pcd(tmp_path, cloud):
    from semicp.cli.common import load_scan_np

    xyz, lab = cloud
    p = tmp_path / "scan.pcd"
    save_pcd(p, xyz, lab)
    pts, labels = load_scan_np(p)
    np.testing.assert_allclose(pts, xyz)
    np.testing.assert_array_equal(labels, lab)
