"""Audio endpoints: TTS and transcription.

TPU-native port of the reference audio module (src/server/audio.rs:336) —
the reference ships these as 501 stubs pending TTS/ASR model support
(audio.rs:4-5); we mirror that contract so clients get a well-formed
not-implemented error rather than a 404.
"""

from __future__ import annotations

from aiohttp import web


async def speech_handler(request: web.Request) -> web.Response:
    return web.json_response({
        "error": {
            "message": "text-to-speech is not implemented yet "
                       "(no TTS model support)",
            "type": "not_implemented_error",
        }
    }, status=501)


async def transcriptions_handler(request: web.Request) -> web.Response:
    return web.json_response({
        "error": {
            "message": "audio transcription is not implemented yet "
                       "(no ASR model support)",
            "type": "not_implemented_error",
        }
    }, status=501)
