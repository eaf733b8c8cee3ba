"""OGG Vorbis *encoder* test fixture via system libvorbis/libvorbisenc/libogg
(ctypes). All codec structs are opaque oversized buffers initialized by the
libraries; the only layout assumed is ogg_page's four leading fields
(header/header_len/body/body_len — stable ABI)."""

from __future__ import annotations

import ctypes

import numpy as np


class _OggPage(ctypes.Structure):
    _fields_ = [("header", ctypes.POINTER(ctypes.c_ubyte)), ("header_len", ctypes.c_long),
                ("body", ctypes.POINTER(ctypes.c_ubyte)), ("body_len", ctypes.c_long)]


def _libs():
    try:
        vorbis = ctypes.CDLL("libvorbis.so.0", mode=ctypes.RTLD_GLOBAL)
        venc = ctypes.CDLL("libvorbisenc.so.2", mode=ctypes.RTLD_GLOBAL)
        ogg = ctypes.CDLL("libogg.so.0", mode=ctypes.RTLD_GLOBAL)
        return vorbis, venc, ogg
    except OSError:
        return None


def ogg_encoder_available() -> bool:
    return _libs() is not None


def encode_ogg(samples: np.ndarray, sample_rate: int = 16000, quality: float = 0.4) -> bytes:
    """Mono float32 samples → OGG Vorbis bytes."""
    libs = _libs()
    if libs is None:
        raise RuntimeError("vorbis encoder libs unavailable")
    vorbis, venc, ogg = libs

    vorbis.vorbis_analysis_buffer.restype = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))

    vi = ctypes.create_string_buffer(512)
    vc = ctypes.create_string_buffer(512)
    vd = ctypes.create_string_buffer(4096)
    vb = ctypes.create_string_buffer(4096)
    os_ = ctypes.create_string_buffer(2048)
    op = ctypes.create_string_buffer(128)
    op_h1 = ctypes.create_string_buffer(128)
    op_h2 = ctypes.create_string_buffer(128)
    op_h3 = ctypes.create_string_buffer(128)
    og = _OggPage()

    vorbis.vorbis_info_init(vi)
    rc = venc.vorbis_encode_init_vbr(vi, ctypes.c_long(1), ctypes.c_long(sample_rate),
                                     ctypes.c_float(quality))
    if rc != 0:
        raise RuntimeError(f"vorbis_encode_init_vbr failed ({rc})")
    vorbis.vorbis_comment_init(vc)
    vorbis.vorbis_analysis_init(vd, vi)
    vorbis.vorbis_block_init(vd, vb)
    ogg.ogg_stream_init(os_, 1)

    out = bytearray()

    def pages(flush: bool):
        fn = ogg.ogg_stream_flush if flush else ogg.ogg_stream_pageout
        while fn(os_, ctypes.byref(og)) != 0:
            out.extend(ctypes.string_at(og.header, og.header_len))
            out.extend(ctypes.string_at(og.body, og.body_len))

    vorbis.vorbis_analysis_headerout(vd, vc, op_h1, op_h2, op_h3)
    # First page must contain ONLY the identification header (spec
    # requirement; libvorbisfile rejects the stream otherwise).
    ogg.ogg_stream_packetin(os_, op_h1)
    pages(flush=True)
    ogg.ogg_stream_packetin(os_, op_h2)
    ogg.ogg_stream_packetin(os_, op_h3)
    pages(flush=True)

    x = np.asarray(samples, np.float32).reshape(-1)
    pos = 0
    chunk = 1024
    while True:
        n = min(chunk, len(x) - pos)
        if n > 0:
            bufpp = vorbis.vorbis_analysis_buffer(vd, chunk)
            ctypes.memmove(bufpp[0], x[pos : pos + n].ctypes.data, n * 4)
        vorbis.vorbis_analysis_wrote(vd, n)
        while vorbis.vorbis_analysis_blockout(vd, vb) == 1:
            vorbis.vorbis_analysis(vb, None)
            vorbis.vorbis_bitrate_addblock(vb)
            while vorbis.vorbis_bitrate_flushpacket(vd, op) == 1:
                ogg.ogg_stream_packetin(os_, op)
                pages(flush=False)
        if n == 0:
            break
        pos += n
    pages(flush=True)

    ogg.ogg_stream_clear(os_)
    vorbis.vorbis_block_clear(vb)
    vorbis.vorbis_dsp_clear(vd)
    vorbis.vorbis_comment_clear(vc)
    vorbis.vorbis_info_clear(vi)
    return bytes(out)


__all__ = ["encode_ogg", "ogg_encoder_available"]
