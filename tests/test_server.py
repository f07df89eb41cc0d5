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


@pytest.fixture(scope="module")
def batched_server(tmp_path_factory):
    """Same tiny bundle, served with max_streams=4 (batched WS engine)."""
    import jax
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor
    from masr_tpu.infer.server import ASRServer
    from masr_tpu.models.registry import build_model
    from masr_tpu.models.cmvn import GlobalCMVN
    import jax.numpy as jnp

    FEAT = 80
    vocab = ["<blank>", "<unk>", "你", "好", "<space>", "<eos>"]
    out = tmp_path_factory.mktemp("srv_bundle_batched")
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
    srv = ASRServer(predictor, host="127.0.0.1", port=port, ws_port=ws_port,
                    max_streams=4)
    srv.start(block=False)
    import time
    time.sleep(0.5)
    yield {"port": port, "ws_port": ws_port, "predictor": predictor}
    srv.stop()


def _make_pcm(freq, seconds=1.5, sr=16000, seed=0):
    rs = np.random.RandomState(seed)
    t = np.arange(int(seconds * sr)) / sr
    sig = 0.3 * np.sin(2 * np.pi * freq * t) \
        + 0.02 * rs.standard_normal(len(t))
    return (np.clip(sig, -1, 1) * 32767).astype(np.int16).tobytes()


async def _stream_ws(uri, pcm, step=16000):
    import websockets
    final = None
    async with websockets.connect(uri) as ws:
        for i in range(0, len(pcm), step):
            chunk = pcm[i:i + step]
            last = i + step >= len(pcm)
            await ws.send(chunk + b"end" if last else chunk)
            if last:
                while True:
                    msg = json.loads(await ws.recv())
                    if msg.get("is_end"):
                        final = msg
                        break
            else:
                try:
                    await asyncio.wait_for(ws.recv(), timeout=0.2)
                except asyncio.TimeoutError:
                    pass
    return final


def test_batched_ws_concurrent_sessions_isolated(batched_server):
    """Two simultaneous WS streams with different audio through the
    batched engine must match their single-stream baselines (no state
    mixing across slots)."""
    uri = f"ws://127.0.0.1:{batched_server['ws_port']}/"
    pcm_a = _make_pcm(300, seed=1)
    pcm_b = _make_pcm(1200, seed=2)

    # baselines, run alone
    base_a = asyncio.run(_stream_ws(uri, pcm_a))
    base_b = asyncio.run(_stream_ws(uri, pcm_b))
    assert base_a is not None and base_b is not None

    async def both():
        return await asyncio.gather(_stream_ws(uri, pcm_a),
                                    _stream_ws(uri, pcm_b))

    got_a, got_b = asyncio.run(both())
    assert got_a["result"] == base_a["result"]
    assert got_b["result"] == base_b["result"]


def test_batched_ws_slot_overflow_rejected(batched_server):
    """A 5th concurrent connection on a 4-slot server gets a busy error."""
    import websockets
    uri = f"ws://127.0.0.1:{batched_server['ws_port']}/"

    async def run():
        conns = []
        for _ in range(4):
            conns.append(await websockets.connect(uri))
        try:
            async with websockets.connect(uri) as ws5:
                msg = json.loads(await ws5.recv())
                assert msg["code"] == 1 and "slots" in msg["msg"]
        finally:
            for c in conns:
                await c.close()

    asyncio.run(run())


def test_single_predictor_ws_busy_guard(server, test_wav_path):
    """Without the batched engine, a second concurrent streaming
    connection is rejected instead of silently corrupting the shared
    stream state."""
    import websockets
    uri = f"ws://127.0.0.1:{server['ws_port']}/"
    pcm = _make_pcm(500, seconds=1.0)

    async def run():
        async with websockets.connect(uri) as ws1:
            await ws1.send(pcm[:16000])
            await asyncio.sleep(0.3)  # let the handler claim the stream
            async with websockets.connect(uri) as ws2:
                msg = json.loads(await ws2.recv())
                assert msg["code"] == 1 and "busy" in msg["msg"]
            await ws1.send(pcm[16000:] + b"end")
            while True:
                m = json.loads(await ws1.recv())
                if m.get("is_end"):
                    return m

    final = asyncio.run(run())
    assert final["code"] == 0


def test_batched_ws_with_beam_decoder(tmp_path):
    """A beam-configured predictor served with max_streams routes slots
    through the on-device batched beam search."""
    import jax
    import jax.numpy as jnp
    import time
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor
    from masr_tpu.infer.server import ASRServer
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.registry import build_model
    FEAT = 80
    vocab = ["<blank>", "<unk>", "你", "好", "<space>", "<eos>"]
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
    out = str(tmp_path / "bb")
    save_inference_bundle(out, "conformer", True, FEAT, vocab,
                          np.zeros(FEAT), np.ones(FEAT), enc, dec,
                          dict(ctc_weight=0.5),
                          {"feature_method": "fbank", "n_mels": FEAT},
                          variables)
    predictor = MASRPredictor(out, decoder="ctc_beam_search",
                              decoder_configs={"beam_size": 4,
                                               "cutoff_top_n": 4},
                              warmup=False)
    srv = ASRServer(predictor, host="127.0.0.1", port=_free_port(),
                    ws_port=_free_port(), max_streams=2)
    assert srv.batch_session is not None
    assert srv.batch_session.decoder == "ctc_beam_search_device"
    srv.start(block=False)
    time.sleep(0.5)
    try:
        pcm = _make_pcm(420, seconds=1.2)
        final = asyncio.run(_stream_ws(
            f"ws://127.0.0.1:{srv.ws_port}/", pcm))
        assert final is not None and final["code"] == 0
    finally:
        srv.stop()


def test_stats_endpoint(server, test_wav_path):
    """/stats reports request counts + latency percentiles (observability
    beyond the reference server)."""
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server['port']}/stats") as r:
        before = json.loads(r.read())
    b = before["endpoints"].get("/recognition", {"count": 0, "errors": 0})
    raw = open(test_wav_path, "rb").read()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server['port']}/recognition", data=raw,
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req):
        pass
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server['port']}/stats") as r:
        stats = json.loads(r.read())
    assert stats["uptime_s"] >= 0
    rec = stats["endpoints"]["/recognition"]
    # this successful request increments count but not errors (error
    # outcomes from other tests on the shared server ARE counted now —
    # the round-2 advisor fix)
    assert rec["count"] == b["count"] + 1
    assert rec["errors"] == b["errors"]
    assert rec["p50_ms"] is not None and rec["p50_ms"] > 0
    assert set(stats["streaming"]) == {"active", "sessions_total",
                                       "chunks_total"}


def test_stats_unit():
    from masr_tpu.infer.server import ServerStats
    s = ServerStats()
    for ms in (10, 20, 30, 40, 100):
        s.observe("/x", ms / 1000.0)
    s.observe("/x", 0.5, ok=False)
    s.stream_opened(); s.stream_chunk(); s.stream_chunk(); s.stream_closed()
    snap = s.snapshot()
    assert snap["endpoints"]["/x"]["count"] == 6
    assert snap["endpoints"]["/x"]["errors"] == 1
    assert 20 <= snap["endpoints"]["/x"]["p50_ms"] <= 100
    assert snap["streaming"] == {"active": 0, "sessions_total": 1,
                                 "chunks_total": 2}
