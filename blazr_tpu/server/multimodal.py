"""Multimodal message content: string-or-parts, image + audio decode.

TPU-native port of the reference multimodal content layer
(src/server/multimodal.rs:18-320): OpenAI-compatible content arrays where
``content`` is either a plain string or a list of parts
(``{"type": "text"|"image_url"|"input_audio", ...}``), image decode from
data URIs / http(s) URLs / plain base64, MIME sniffing from magic bytes,
and audio decode (pcm16 + 16-bit PCM WAV) into normalized f32 samples.
"""

from __future__ import annotations

import base64
import binascii
from typing import Any, Optional

import numpy as np


class MultimodalError(ValueError):
    """Decode failure → 400 invalid_request_error (reference chat.rs:85-108)."""


# ---------------------------------------------------------------------------
# MessageContent helpers (string-or-parts)
# ---------------------------------------------------------------------------

def content_text(content: Any) -> str:
    """All text parts, newline-joined (reference MessageContent::text)."""
    if content is None:
        return ""
    if isinstance(content, str):
        return content
    if isinstance(content, list):
        return "\n".join(p.get("text", "") for p in content
                         if isinstance(p, dict) and p.get("type") == "text")
    return str(content)


def _parts(content: Any) -> list[dict]:
    return content if isinstance(content, list) else []


def has_images(content: Any) -> bool:
    return any(isinstance(p, dict) and p.get("type") == "image_url"
               for p in _parts(content))


def has_audio(content: Any) -> bool:
    return any(isinstance(p, dict) and p.get("type") == "input_audio"
               for p in _parts(content))


def image_urls(content: Any) -> list[dict]:
    """Each entry: {"url": ..., "detail": "auto"|"low"|"high"}."""
    out = []
    for p in _parts(content):
        if isinstance(p, dict) and p.get("type") == "image_url":
            img = p.get("image_url")
            if isinstance(img, str):              # lenient: bare string
                img = {"url": img}
            if not isinstance(img, dict) or "url" not in img:
                raise MultimodalError("image_url part missing 'url'")
            out.append({"url": img["url"],
                        "detail": img.get("detail", "auto")})
    return out


def audio_inputs(content: Any) -> list[dict]:
    """Each entry: {"data": <b64>, "format": "wav"|"pcm16"|...}."""
    out = []
    for p in _parts(content):
        if isinstance(p, dict) and p.get("type") == "input_audio":
            a = p.get("input_audio")
            if not isinstance(a, dict) or "data" not in a or "format" not in a:
                raise MultimodalError(
                    "input_audio part requires 'data' and 'format'")
            out.append(a)
    return out


# ---------------------------------------------------------------------------
# base64 / image decode
# ---------------------------------------------------------------------------

def b64_decode(data: str) -> bytes:
    """Permissive base64: standard or URL-safe alphabet, padding optional
    (reference encoding::base64_decode)."""
    s = "".join(data.split()).replace("-", "+").replace("_", "/")
    s += "=" * (-len(s) % 4)
    try:
        return base64.b64decode(s, validate=True)
    except (binascii.Error, ValueError) as e:
        raise MultimodalError(f"invalid base64: {e}")


def detect_image_mime(data: bytes) -> str:
    """MIME from magic bytes (reference multimodal.rs:196-209)."""
    if data.startswith(b"\x89PNG"):
        return "image/png"
    if data.startswith(b"\xff\xd8\xff"):
        return "image/jpeg"
    if data.startswith(b"RIFF") and len(data) > 12 and data[8:12] == b"WEBP":
        return "image/webp"
    if data.startswith(b"GIF8"):
        return "image/gif"
    return "application/octet-stream"


async def decode_image(url: str) -> tuple[bytes, str]:
    """URL string → (raw image bytes, mime type).

    Supports ``data:`` URIs, http(s) URLs (fetched via aiohttp), and plain
    base64 payloads (reference multimodal.rs:141-194).
    """
    if url.startswith("data:"):
        rest = url[len("data:"):]
        if "," not in rest:
            raise MultimodalError("invalid data URI: missing comma")
        meta, data = rest.split(",", 1)
        mime = meta.split(";")[0] or "image/png"
        return b64_decode(data), mime
    if url.startswith(("http://", "https://")):
        import ipaddress
        import socket
        from urllib.parse import urlparse

        import aiohttp

        # SSRF guard: refuse fetches that resolve to loopback/link-local/
        # private ranges (cloud metadata endpoints live there). Outbound
        # media fetch is a server-side request on the USER's behalf.
        host = urlparse(url).hostname or ""
        try:
            infos = socket.getaddrinfo(host, None)
            for info in infos:
                ip = ipaddress.ip_address(info[4][0])
                if (ip.is_private or ip.is_loopback or ip.is_link_local
                        or ip.is_reserved):
                    raise MultimodalError(
                        f"refusing to fetch media from non-public address "
                        f"{host}")
        except MultimodalError:
            raise
        except Exception as e:
            raise MultimodalError(f"cannot resolve media host {host}: {e}")
        try:
            async with aiohttp.ClientSession() as sess:
                async with sess.get(
                        url, timeout=aiohttp.ClientTimeout(total=30)) as resp:
                    if resp.status != 200:
                        raise MultimodalError(
                            f"image fetch failed with status {resp.status}: {url}")
                    mime = resp.headers.get("Content-Type", "image/png")
                    # Bounded read: an endless body must not OOM the server.
                    data = b""
                    async for chunk in resp.content.iter_chunked(1 << 20):
                        data += chunk
                        if len(data) > MAX_MEDIA_BYTES:
                            raise MultimodalError(
                                f"media exceeds {MAX_MEDIA_BYTES} byte limit")
                    return data, mime
        except MultimodalError:
            raise
        except Exception as e:
            raise MultimodalError(f"failed to fetch image from {url}: {e}")
    data = b64_decode(url)
    return data, detect_image_mime(data)


# ---------------------------------------------------------------------------
# audio decode
# ---------------------------------------------------------------------------

AUDIO_FORMATS = ("pcm16", "wav", "mp3", "flac", "ogg")

# Remote media fetch cap (32 MiB — larger than any sane image/audio clip).
MAX_MEDIA_BYTES = 32 << 20


def _pcm16_to_f32(raw: bytes) -> np.ndarray:
    n = len(raw) // 2
    samples = np.frombuffer(raw[: n * 2], dtype="<i2").astype(np.float32)
    return samples / 32768.0


def _wav_to_pcm16(raw: bytes) -> bytes:
    """Validate a 16-bit PCM WAV container and return the data chunk
    (reference multimodal.rs:248-301 — the data chunk is located by walking
    word-aligned chunks, not assumed at byte 36)."""
    if len(raw) < 44:
        raise MultimodalError("WAV data too short for valid header")
    if raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise MultimodalError("invalid WAV header: missing RIFF/WAVE signature")
    # Both fmt AND data are located by the chunk walk — encoders commonly
    # emit JUNK/LIST chunks before fmt, so fixed offsets 20/34 read
    # garbage there.
    fmt_seen = False
    data_chunk: "bytes | None" = None
    off = 12
    while off + 8 <= len(raw):
        cid = raw[off:off + 4]
        size = int.from_bytes(raw[off + 4:off + 8], "little")
        start = off + 8
        if cid == b"fmt ":
            if start + 16 > len(raw):
                raise MultimodalError("WAV fmt chunk truncated")
            audio_fmt = int.from_bytes(raw[start:start + 2], "little")
            if audio_fmt != 1:
                raise MultimodalError(
                    f"unsupported WAV audio format {audio_fmt}: only PCM "
                    f"(1) is supported")
            bits = int.from_bytes(raw[start + 14:start + 16], "little")
            if bits != 16:
                raise MultimodalError(
                    f"unsupported WAV bit depth {bits}: only 16-bit is "
                    f"supported")
            fmt_seen = True
        elif cid == b"data":
            data_chunk = raw[start: min(start + size, len(raw))]
        off = start + size
        if off % 2:
            off += 1
    if not fmt_seen:
        raise MultimodalError("WAV file missing 'fmt ' chunk")
    if data_chunk is None:
        raise MultimodalError("WAV file missing 'data' chunk")
    return data_chunk


def decode_audio(input_audio: dict) -> np.ndarray:
    """InputAudio payload → f32 samples in [-1, 1]
    (reference multimodal.rs:303-320). pcm16 + wav; compressed formats
    are rejected like the reference."""
    fmt = input_audio.get("format", "")
    if fmt not in AUDIO_FORMATS:
        raise MultimodalError(
            f"Unsupported audio format '{fmt}'. Supported: "
            + ", ".join(AUDIO_FORMATS))
    raw = b64_decode(input_audio.get("data", ""))
    if fmt == "pcm16":
        return _pcm16_to_f32(raw)
    if fmt == "wav":
        return _pcm16_to_f32(_wav_to_pcm16(raw))
    raise MultimodalError(
        f"Audio format '{fmt}' is not yet supported. "
        "Currently supported: pcm16, wav")


# ---------------------------------------------------------------------------
# request-level extraction
# ---------------------------------------------------------------------------

async def extract_media(messages: list[dict]
                        ) -> tuple[list[bytes], list[np.ndarray]]:
    """Decode every image and audio part across all messages
    (reference chat.rs:70-118). Raises MultimodalError on any failure."""
    images: list[bytes] = []
    audio: list[np.ndarray] = []
    for m in messages:
        content = m.get("content")
        for img in image_urls(content):
            data, _mime = await decode_image(img["url"])
            images.append(data)
        for a in audio_inputs(content):
            audio.append(decode_audio(a))
    return images, audio
