"""CLI coverage matrix, mirroring the reference's tests/test_cmd.sh:
flag families, recompression, metadata injection, checksums, negative
cases — plus byte-parity against the reference binary where applicable."""

import hashlib
import io
import subprocess
import zlib

import numpy as np
import pytest

from sjpeg_tpu import cli

from conftest import make_test_image, write_ppm, reference_encode


@pytest.fixture(scope="module")
def ppm(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    img = make_test_image(96, 80, seed=11)
    p = d / "in.ppm"
    write_ppm(p, img)
    return p


def run_cli(*argv):
    return cli.main([str(a) for a in argv])


def test_basic_encode_decodable(ppm, tmp_path):
    out = tmp_path / "out.jpg"
    assert run_cli(ppm, "-o", out, "-q", "80", "-quiet") == 0
    from PIL import Image
    im = Image.open(out)
    assert im.size == (96, 80)


@pytest.mark.parametrize("flags", [
    ["-420"], ["-444"], ["-sharp"], ["-gray"], ["-yuv_mode", "3"],
    ["-no_optim"], ["-no_adapt"], ["-trellis"],
    ["-size", "3000"], ["-psnr", "33"],
    ["-size", "3000", "-pass", "4", "-tolerance", "2"],
])
def test_flag_families(ppm, tmp_path, flags):
    out = tmp_path / "out.jpg"
    assert run_cli(ppm, "-o", out, "-quiet", *flags) == 0
    assert out.read_bytes()[:2] == b"\xff\xd8"


@pytest.mark.parametrize("flags", [
    ["-q", "75", "-420"], ["-q", "90", "-444", "-trellis"],
    ["-q", "60", "-gray"], ["-size", "4000", "-420"],
    ["-psnr", "33", "-420"], ["-q", "85", "-sharp"],
])
def test_byte_parity_with_reference(reference_bin, ppm, tmp_path, flags):
    ours = tmp_path / "ours.jpg"
    ref = tmp_path / "ref.jpg"
    assert run_cli(ppm, "-o", ours, "-quiet", *flags) == 0
    subprocess.run([str(reference_bin), str(ppm), "-o", str(ref), "-quiet",
                    *flags], check=True)
    assert ours.read_bytes() == ref.read_bytes()


def test_recompression_matches_reference(reference_bin, ppm, tmp_path):
    src = tmp_path / "src.jpg"
    subprocess.run([str(reference_bin), str(ppm), "-o", str(src), "-q", "85",
                    "-quiet"], check=True)
    ours = tmp_path / "ours.jpg"
    ref = tmp_path / "ref.jpg"
    for flags in (["-r", "80"], ["-q", "70"], ["-r", "90", "-no_limit"]):
        assert run_cli(src, "-o", ours, "-quiet", *flags) == 0
        subprocess.run([str(reference_bin), str(src), "-o", str(ref),
                        "-quiet", *flags], check=True)
        assert ours.read_bytes() == ref.read_bytes(), flags


def test_estimate_matches_reference(reference_bin, ppm, tmp_path, capsys):
    src = tmp_path / "src.jpg"
    subprocess.run([str(reference_bin), str(ppm), "-o", str(src), "-q", "85",
                    "-quiet"], check=True)
    assert run_cli(src, "-estimate") == 0
    ours = capsys.readouterr().out.strip()
    ref = subprocess.run([str(reference_bin), str(src), "-estimate"],
                         capture_output=True, text=True).stdout.strip()
    assert ours == ref


def test_crc_md5(ppm, tmp_path, capsys):
    out = tmp_path / "o.jpg"
    assert run_cli(ppm, "-o", out, "-q", "75", "-quiet") == 0
    data = out.read_bytes()
    assert run_cli(ppm, "-q", "75", "-crc") == 0
    assert capsys.readouterr().out.strip() == \
        f"0x{zlib.crc32(data) & 0xFFFFFFFF:08x}"
    assert run_cli(ppm, "-q", "75", "-md5") == 0
    assert capsys.readouterr().out.strip() == hashlib.md5(data).hexdigest()


def test_metadata_injection(ppm, tmp_path):
    xmp = tmp_path / "m.xmp"
    xmp.write_bytes(b"<x:xmpmeta>test</x:xmpmeta>")
    exif = tmp_path / "m.exif"
    exif.write_bytes(b"II*\x00" + b"\x00" * 8)
    icc = tmp_path / "m.icc"
    icc.write_bytes(bytes(range(256)) * 400)    # oversized -> multi-chunk
    out = tmp_path / "o.jpg"
    assert run_cli(ppm, "-o", out, "-q", "75", "-quiet", "-xmp", xmp,
                   "-exif", exif, "-icc", icc) == 0
    data = out.read_bytes()
    assert b"xmpmeta" in data
    assert b"ICC_PROFILE" in data
    assert b"Exif\x00\x00" in data
    from PIL import Image
    Image.open(io.BytesIO(data)).load()     # still decodable


def test_info_mode(ppm, capsys):
    assert run_cli(ppm, "-i") == 0
    out = capsys.readouterr().out
    assert "Riskiness" in out


def test_negative_cases(tmp_path, capsys):
    with pytest.raises(SystemExit):
        run_cli()                          # missing input
    assert run_cli(tmp_path / "nope.ppm") == 1   # unreadable input


def test_inspect_interactive_loop(tmp_path):
    """The vjpeg-analog interactive loop: quality steps, mode changes,
    toggles, views and info commands re-encode and report."""
    import io as _io
    import numpy as np
    from PIL import Image
    from sjpeg_tpu import inspect_tool

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (32, 40, 3)).astype(np.uint8)
    src = tmp_path / "in.png"
    Image.fromarray(rgb).save(src)
    cmds = "\n".join(["+", "++", "-", "1", "3", "o", "a", "t", "t",
                      "e", "r", "m", "i", "w", "h", "zz", "q"]) + "\n"
    out = _io.StringIO()
    report = inspect_tool.interactive(
        str(src), str(tmp_path / "rep"), quality=70,
        stdin=_io.StringIO(cmds), stdout=out)
    text = out.getvalue()
    assert "bytes" in text and "dB" in text
    assert (tmp_path / "rep" / "error_map.png").exists()
    assert (tmp_path / "rep" / "risk_map.png").exists()
    assert (tmp_path / "rep" / "out.jpg").exists()
    assert report["quality"] == 80.0          # 70 +1 +10 -1
    assert report["bytes"] > 0
    # the written encode decodes
    Image.open(tmp_path / "rep" / "out.jpg").load()
