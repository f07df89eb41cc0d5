"""Server tests: REST upload + WebSocket streaming against a tiny bundle."""
import asyncio
import json
import socket
import urllib.request

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import jax
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor
    from masr_tpu.infer.server import ASRServer
    from masr_tpu.models.registry import build_model
    from masr_tpu.models.cmvn import GlobalCMVN
    import jax.numpy as jnp

    FEAT = 80
    vocab = ["<blank>", "<unk>", "你", "好", "<space>", "<eos>"]
    out = tmp_path_factory.mktemp("srv_bundle")
    enc = dict(output_size=32, attention_heads=2, linear_units=32,
               num_blocks=1, cnn_module_kernel=7)
    dec = dict(attention_heads=2, linear_units=32, num_blocks=1,
               r_num_blocks=0)
    model = build_model("conformer", FEAT, len(vocab), streaming=True,
                        encoder_conf=enc, decoder_conf=dec,
                        model_conf=dict(ctc_weight=0.5),
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    save_inference_bundle(str(out), "conformer", True, FEAT, vocab,
                          np.zeros(FEAT), np.ones(FEAT), enc, dec,
                          dict(ctc_weight=0.5),
                          {"feature_method": "fbank", "n_mels": FEAT},
                          variables)
    predictor = MASRPredictor(str(out), decoder="ctc_greedy", warmup=False)
    port = _free_port()
    ws_port = _free_port()
    srv = ASRServer(predictor, host="127.0.0.1", port=port, ws_port=ws_port)
    srv.start(block=False)
    import time
    time.sleep(0.5)
    yield {"port": port, "ws_port": ws_port}
    srv.stop()


def test_index_page(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server['port']}/") as r:
        assert r.status == 200
        assert b"masr_tpu" in r.read()


def test_recognition_endpoint(server, test_wav_path):
    raw = open(test_wav_path, "rb").read()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server['port']}/recognition", data=raw,
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req) as r:
        payload = json.loads(r.read())
    assert payload["code"] == 0
    assert "result" in payload


def test_recognition_long_endpoint(server, test_wav_path):
    raw = open(test_wav_path, "rb").read()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server['port']}/recognition_long_audio", data=raw,
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req) as r:
        payload = json.loads(r.read())
    assert payload["code"] == 0


def test_recognition_multipart_upload(server, test_wav_path):
    raw = open(test_wav_path, "rb").read()
    boundary = "bnd123"
    body = (f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="audio"; '
            f'filename="t.wav"\r\n'
            f"Content-Type: audio/wav\r\n\r\n").encode() + raw + \
        f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server['port']}/recognition", data=body,
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req) as r:
        payload = json.loads(r.read())
    assert payload["code"] == 0


def test_recognition_no_audio_400(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server['port']}/recognition", data=b"",
        headers={"Content-Type": "application/octet-stream"})
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_websocket_streaming(server, test_wav_path):
    import websockets
    from masr_tpu.audio import AudioSegment

    seg = AudioSegment.from_file(test_wav_path)
    pcm = seg.to("int16").tobytes()

    async def run():
        uri = f"ws://127.0.0.1:{server['ws_port']}/"
        results = []
        async with websockets.connect(uri) as ws:
            step = 16000  # 0.5 s of int16 pcm
            for i in range(0, len(pcm), step):
                chunk = pcm[i:i + step]
                last = i + step >= len(pcm)
                await ws.send(chunk + b"end" if last else chunk)
                if last:
                    results.append(json.loads(await ws.recv()))
                else:
                    try:
                        msg = await asyncio.wait_for(ws.recv(), timeout=5)
                        results.append(json.loads(msg))
                    except asyncio.TimeoutError:
                        pass
        return results

    results = asyncio.run(run())
    assert len(results) >= 1
    assert results[-1]["is_end"] is True
    assert "result" in results[-1]
