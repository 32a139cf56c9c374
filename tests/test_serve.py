"""Serving-layer tests: bucketed jit caching, padding, missing modalities."""

import jax
import numpy as np
import pytest

from aecf_tpu.models import VisionLanguageModel
from aecf_tpu.serve import FusionPredictor, pad_to_bucket


def test_pad_to_bucket():
    assert pad_to_bucket(1, (32, 256)) == 32
    assert pad_to_bucket(32, (32, 256)) == 32
    assert pad_to_bucket(33, (32, 256)) == 256
    assert pad_to_bucket(999, (32, 256)) == 256


@pytest.fixture(scope="module")
def predictor():
    model = VisionLanguageModel(
        img_dim=32, txt_dim=16, hidden_dim=8, num_classes=5
    )
    params = model.init(jax.random.key(0))

    def apply_fn(p, image, text):
        return model.apply(p, image, text, training=False)

    return FusionPredictor(
        apply_fn,
        params,
        modality_names=("image", "text"),
        buckets=(8, 32),
        apply_sigmoid=True,
    )


def test_ragged_batch_matches_unpadded(predictor):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(5, 32)).astype(np.float32)
    txt = rng.normal(size=(5, 16)).astype(np.float32)
    out5 = predictor(image=img, text=txt)
    assert out5.shape == (5, 5)
    # Same rows inside a bigger batch give identical outputs (padding must
    # not leak into real rows).
    img2 = np.concatenate([img, rng.normal(size=(30, 32)).astype(np.float32)])
    txt2 = np.concatenate([txt, rng.normal(size=(30, 16)).astype(np.float32)])
    out35 = predictor(image=img2, text=txt2)
    np.testing.assert_allclose(out35[:5], out5, atol=1e-6)


def test_chunking_beyond_max_bucket(predictor):
    rng = np.random.default_rng(1)
    img = rng.normal(size=(70, 32)).astype(np.float32)
    txt = rng.normal(size=(70, 16)).astype(np.float32)
    out = predictor(image=img, text=txt)
    assert out.shape == (70, 5)
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()  # sigmoid


def test_missing_modality_zeroed(predictor):
    rng = np.random.default_rng(2)
    img = rng.normal(size=(4, 32)).astype(np.float32)
    txt = rng.normal(size=(4, 16)).astype(np.float32)
    predictor(image=img, text=txt)  # teach it the text dim
    out_missing = predictor(image=img)
    out_zeroed = predictor(image=img, text=np.zeros_like(txt))
    np.testing.assert_allclose(out_missing, out_zeroed, atol=1e-6)


def test_errors(predictor):
    with pytest.raises(ValueError, match="At least one"):
        predictor()
    with pytest.raises(ValueError, match="unknown"):
        predictor(audio=np.zeros((2, 4), np.float32))
    with pytest.raises(ValueError, match="batch mismatch"):
        predictor(
            image=np.zeros((2, 32), np.float32),
            text=np.zeros((3, 16), np.float32),
        )
    # 0-row arrays pass every shape check but make zero device calls —
    # must be a clear error, not np.concatenate([])'s opaque one
    with pytest.raises(ValueError, match="at least one row"):
        predictor(image=np.zeros((0, 32), np.float32))


def test_calls_counts_device_dispatches(predictor):
    """`calls` is the device-call counter micro-batching observability is
    built on: a chunked request counts once per bucket dispatch, a request
    failing validation counts zero."""
    rng = np.random.default_rng(3)
    before = predictor.calls
    # 40 rows with buckets (8, 32): one 32-chunk + one 8-chunk = 2 calls
    predictor(
        image=rng.normal(size=(40, 32)).astype(np.float32),
        text=rng.normal(size=(40, 16)).astype(np.float32),
    )
    assert predictor.calls - before == 2
    with pytest.raises(ValueError):
        predictor(image=np.zeros((2, 32), np.float32),
                  text=np.zeros((3, 16), np.float32))
    assert predictor.calls - before == 2  # failed request: zero


class TestHTTPServing:
    """RPC front end: JSON + binary npz protocols over a live server."""

    @pytest.fixture(scope="class")
    def server(self, request):
        # module-scoped predictor fixture isn't visible here; build our own
        model = VisionLanguageModel(
            img_dim=32, txt_dim=16, hidden_dim=8, num_classes=5
        )
        params = model.init(jax.random.key(0))

        def apply_fn(p, image, text):
            return model.apply(p, image, text, training=False)

        pred = FusionPredictor(
            apply_fn, params, modality_names=("image", "text"),
            buckets=(8, 32),
        )
        from aecf_tpu.serving_http import PredictionServer

        srv = PredictionServer(pred, port=0).start()  # ephemeral port
        yield srv, pred
        srv.stop()

    def test_healthz(self, server):
        import json as _json
        import urllib.request

        srv, _ = server
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=10
        ) as resp:
            body = _json.loads(resp.read())
        assert body["status"] == "ok"
        assert body["modalities"] == ["image", "text"]

    def test_json_and_binary_match_local(self, server):
        from aecf_tpu.serving_http import predict_remote

        srv, pred = server
        rng = np.random.default_rng(0)
        img = rng.normal(size=(5, 32)).astype(np.float32)
        txt = rng.normal(size=(5, 16)).astype(np.float32)
        local = pred(image=img, text=txt)
        url = f"http://127.0.0.1:{srv.port}"
        remote_bin = predict_remote(url, image=img, text=txt)
        remote_json = predict_remote(url, binary=False, image=img, text=txt)
        np.testing.assert_allclose(remote_bin, local, atol=1e-6)
        np.testing.assert_allclose(remote_json, local, atol=1e-5)

    def test_missing_modality_over_rpc(self, server):
        from aecf_tpu.serving_http import predict_remote

        srv, pred = server
        rng = np.random.default_rng(1)
        img = rng.normal(size=(3, 32)).astype(np.float32)
        url = f"http://127.0.0.1:{srv.port}"
        # teach the predictor the text dim first
        predict_remote(url, image=img,
                       text=np.zeros((3, 16), np.float32))
        out = predict_remote(url, image=img)
        assert out.shape == (3, 5)
        assert np.isfinite(out).all()

    def test_bad_request_is_400(self, server):
        import urllib.error
        import urllib.request

        srv, _ = server
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/predict",
            data=b'{"audio": [[1.0]]}',
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400

    def test_non_object_json_is_400_not_500(self, server):
        import urllib.error
        import urllib.request

        srv, _ = server
        for body in (b"[1, 2, 3]", b'"text"', b"not json at all"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/v1/predict",
                data=body,
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=10)
            assert e.value.code == 400, body

    def test_malformed_npz_is_400_not_500(self, server):
        """Fuzz pass (round-2 verdict Next #8): garbage bytes, truncated
        zips, and non-float payloads under the binary content type are
        CLIENT errors — 400, never 500, and never a wedged server."""
        import io
        import urllib.error
        import urllib.request

        srv, _ = server
        # a real npz, truncated mid-stream
        buf = io.BytesIO()
        np.savez(buf, image=np.zeros((1, 32), np.float32))
        truncated = buf.getvalue()[: len(buf.getvalue()) // 2]
        bodies = [
            b"not a zip at all",
            b"",
            b"PK\x03\x04 almost a zip",
            truncated,
        ]
        for body in bodies:
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/v1/predict",
                data=body,
                headers={"Content-Type": "application/x-npz"},
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=10)
            assert e.value.code == 400, body[:20]
        # server still healthy afterwards
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=10
        ) as resp:
            assert resp.status == 200

    def test_fuzz_mixed_valid_invalid_concurrent(self, server):
        """Random mix of well-formed and malformed concurrent requests:
        every request gets a definite response, well-formed ones are
        bit-identical to a direct predictor call."""
        import concurrent.futures as cf
        import urllib.error
        import urllib.request

        from aecf_tpu.serving_http import predict_remote

        srv, pred = server
        url = f"http://127.0.0.1:{srv.port}"
        rng = np.random.default_rng(7)
        img = rng.normal(size=(2, 32)).astype(np.float32)
        txt = rng.normal(size=(2, 16)).astype(np.float32)
        expected = pred(image=img, text=txt)

        def good():
            return ("good", predict_remote(url, image=img, text=txt))

        def bad_width():
            try:
                predict_remote(url, image=rng.normal(size=(2, 7)).astype(
                    np.float32), text=txt)
                return ("bad", "no-error")
            except urllib.error.HTTPError as e:
                return ("bad", e.code)

        def bad_bytes():
            req = urllib.request.Request(
                f"{url}/v1/predict", data=b"\x00\xff garbage",
                headers={"Content-Type": "application/x-npz"},
            )
            try:
                urllib.request.urlopen(req, timeout=10)
                return ("bytes", "no-error")
            except urllib.error.HTTPError as e:
                return ("bytes", e.code)

        jobs = [good, bad_width, bad_bytes] * 4
        rng.shuffle(jobs)
        with cf.ThreadPoolExecutor(max_workers=6) as ex:
            results = [f.result(timeout=60) for f in
                       [ex.submit(j) for j in jobs]]
        for kind, val in results:
            if kind == "good":
                np.testing.assert_allclose(val, expected, atol=1e-6)
            else:
                assert val in (400, 500), (kind, val)


class TestMicroBatcher:
    """Request coalescing: many concurrent small requests → few device
    calls, rows routed back to the right caller."""

    @pytest.fixture()
    def batcher(self):
        from aecf_tpu.serve import MicroBatcher

        model = VisionLanguageModel(
            img_dim=32, txt_dim=16, hidden_dim=8, num_classes=5
        )
        params = model.init(jax.random.key(0))

        def apply_fn(p, image, text):
            return model.apply(p, image, text, training=False)

        pred = FusionPredictor(
            apply_fn, params, modality_names=("image", "text"),
            buckets=(8, 64),
        )
        b = MicroBatcher(pred, max_batch=64, max_wait_ms=20.0)
        yield b, pred
        b.stop()

    def test_concurrent_requests_coalesce_and_match_direct(self, batcher):
        import concurrent.futures as cf

        b, pred = batcher
        rng = np.random.default_rng(0)
        imgs = rng.normal(size=(12, 1, 32)).astype(np.float32)
        txts = rng.normal(size=(12, 1, 16)).astype(np.float32)
        # warm the jit so the timing window can actually coalesce
        pred(image=imgs[0], text=txts[0])
        calls_before = pred.calls

        with cf.ThreadPoolExecutor(max_workers=12) as ex:
            futs = [
                ex.submit(b, image=imgs[i], text=txts[i])
                for i in range(12)
            ]
            outs = [f.result(timeout=30) for f in futs]

        for i, out in enumerate(outs):
            direct = pred(image=imgs[i], text=txts[i])
            np.testing.assert_allclose(out, direct, atol=1e-6)
        # 12 one-row requests must NOT have cost 12 device calls
        coalesced_calls = pred.calls - calls_before - 12  # minus the
        # direct-verification calls made above
        assert coalesced_calls < 12, (pred.calls, calls_before)

    def test_mixed_keysets_grouped_separately(self, batcher):
        import concurrent.futures as cf

        b, pred = batcher
        rng = np.random.default_rng(1)
        img = rng.normal(size=(1, 32)).astype(np.float32)
        txt = rng.normal(size=(1, 16)).astype(np.float32)
        pred(image=img, text=txt)  # teach dims
        with cf.ThreadPoolExecutor(max_workers=4) as ex:
            f1 = ex.submit(b, image=img, text=txt)
            f2 = ex.submit(b, image=img)  # different key-set
            o1, o2 = f1.result(timeout=30), f2.result(timeout=30)
        np.testing.assert_allclose(
            o1, pred(image=img, text=txt), atol=1e-6
        )
        np.testing.assert_allclose(o2, pred(image=img), atol=1e-6)

    def test_wrong_width_request_cannot_fail_neighbors(self, batcher):
        """Round-2 advisor: grouping is by (keyset, feature dims) — a
        malformed-width request must not poison the np.concatenate of
        well-formed requests sharing its modality key-set."""
        import concurrent.futures as cf

        b, pred = batcher
        rng = np.random.default_rng(2)
        img = rng.normal(size=(1, 32)).astype(np.float32)
        txt = rng.normal(size=(1, 16)).astype(np.float32)
        bad_img = rng.normal(size=(1, 7)).astype(np.float32)  # wrong width
        pred(image=img, text=txt)
        with cf.ThreadPoolExecutor(max_workers=4) as ex:
            f_good = ex.submit(b, image=img, text=txt)
            f_bad = ex.submit(b, image=bad_img, text=txt)
            good = f_good.result(timeout=30)
            with pytest.raises(Exception):
                f_bad.result(timeout=30)
        np.testing.assert_allclose(
            good, pred(image=img, text=txt), atol=1e-6
        )

    def test_mismatched_rows_within_request_cannot_fail_neighbors(
        self, batcher
    ):
        """A request whose own modalities disagree on rows has a valid
        keyset (grouping only sees (name, width)) — it must be rejected in
        the caller's thread, not concatenated into a group where the
        predictor's batch-mismatch check fails well-formed neighbors."""
        import concurrent.futures as cf

        b, pred = batcher
        rng = np.random.default_rng(3)
        img = rng.normal(size=(1, 32)).astype(np.float32)
        txt = rng.normal(size=(1, 16)).astype(np.float32)
        pred(image=img, text=txt)
        with pytest.raises(ValueError, match="share a batch"):
            b(image=rng.normal(size=(2, 32)).astype(np.float32),
              text=rng.normal(size=(3, 16)).astype(np.float32))
        with pytest.raises(ValueError, match="at least one row"):
            b(image=np.zeros((0, 32), np.float32))
        # neighbors submitted around a malformed request still succeed
        with cf.ThreadPoolExecutor(max_workers=4) as ex:
            f_good = ex.submit(b, image=img, text=txt)
            good = f_good.result(timeout=30)
        np.testing.assert_allclose(
            good, pred(image=img, text=txt), atol=1e-6
        )

    def test_error_propagates_to_caller(self, batcher):
        b, _ = batcher
        with pytest.raises(ValueError):
            b(bogus=np.zeros((1, 4), np.float32))

    def test_stop_with_in_flight_requests_resolves_all(self, batcher):
        """Shutdown semantics (round-2 verdict Next #8): every future
        enqueued before stop() must resolve (result or exception) — never
        hang — and the worker must drain the queue before exiting."""
        import concurrent.futures as cf
        import threading
        import time

        from aecf_tpu.serve import MicroBatcher

        _, pred = batcher

        class SlowPredictor:
            """Delay each device call so stop() races in-flight work."""

            def __init__(self, inner):
                self._inner = inner
                self.modality_names = inner.modality_names

            def __call__(self, **mods):
                time.sleep(0.05)
                return self._inner(**mods)

        b = MicroBatcher(
            SlowPredictor(pred), max_batch=4, max_wait_ms=30.0
        )
        rng = np.random.default_rng(3)
        img = rng.normal(size=(1, 32)).astype(np.float32)
        txt = rng.normal(size=(1, 16)).astype(np.float32)
        pred(image=img, text=txt)  # warm jit

        with cf.ThreadPoolExecutor(max_workers=8) as ex:
            futs = [
                ex.submit(b, image=img, text=txt) for _ in range(8)
            ]
            time.sleep(0.01)  # let some enqueue
            stopper = threading.Thread(target=b.stop)
            stopper.start()
            # every caller must get a definite outcome within the timeout
            resolved = 0
            for f in futs:
                try:
                    out = f.result(timeout=30)
                    np.testing.assert_allclose(
                        out, pred(image=img, text=txt), atol=1e-6
                    )
                    resolved += 1
                except RuntimeError:
                    # enqueued after stop flipped — a definite error is
                    # an acceptable outcome; a hang is not
                    resolved += 1
            stopper.join(timeout=30)
            assert not stopper.is_alive()
            assert resolved == 8

    def test_stopped_batcher_rejects(self, batcher):
        from aecf_tpu.serve import MicroBatcher

        b, pred = batcher
        b2 = MicroBatcher(pred, max_wait_ms=1.0)
        b2.stop()
        with pytest.raises(RuntimeError, match="stopped"):
            b2(image=np.zeros((1, 32), np.float32))


def test_http_stop_before_start_is_safe(predictor):
    """stop() on a never-started server must not deadlock:
    BaseServer.shutdown() waits on an event only serve_forever sets."""
    import threading

    from aecf_tpu.serving_http import PredictionServer

    srv = PredictionServer(predictor, port=0)
    t = threading.Thread(target=srv.stop, daemon=True)
    t.start()
    t.join(timeout=5)
    assert not t.is_alive()


def test_http_oversized_body_is_413(predictor):
    """The body-size cap must reject BEFORE buffering: one huge
    Content-Length must not OOM the serving process."""
    import http.client
    import json

    from aecf_tpu.serving_http import PredictionServer

    srv = PredictionServer(predictor, port=0, max_body_bytes=1024).start()
    try:
        conn = http.client.HTTPConnection(
            "127.0.0.1", srv.port, timeout=10
        )
        conn.putrequest("POST", "/v1/predict")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(10**12))  # body never sent
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        assert "exceeds" in json.loads(resp.read())["error"]
        conn.close()
        # the server still serves good requests afterwards
        from aecf_tpu.serving_http import predict_remote

        rng = np.random.default_rng(0)
        out = predict_remote(
            f"http://127.0.0.1:{srv.port}",
            image=rng.normal(size=(2, 32)).astype(np.float32),
            text=rng.normal(size=(2, 16)).astype(np.float32),
        )
        assert out.shape[0] == 2
    finally:
        srv.stop()


def test_http_server_with_microbatcher():
    """The RPC front end over a MicroBatcher: concurrent HTTP clients
    coalesce into shared device calls."""
    import concurrent.futures as cf

    from aecf_tpu.serve import MicroBatcher
    from aecf_tpu.serving_http import PredictionServer, predict_remote

    model = VisionLanguageModel(
        img_dim=32, txt_dim=16, hidden_dim=8, num_classes=5
    )
    params = model.init(jax.random.key(0))

    def apply_fn(p, image, text):
        return model.apply(p, image, text, training=False)

    pred = FusionPredictor(
        apply_fn, params, modality_names=("image", "text"), buckets=(8, 64)
    )
    batcher = MicroBatcher(pred, max_batch=64, max_wait_ms=20.0)
    srv = PredictionServer(batcher, port=0).start()
    try:
        rng = np.random.default_rng(0)
        imgs = rng.normal(size=(8, 1, 32)).astype(np.float32)
        txts = rng.normal(size=(8, 1, 16)).astype(np.float32)
        pred(image=imgs[0], text=txts[0])  # warm jit
        calls_before = pred.calls
        url = f"http://127.0.0.1:{srv.port}"
        with cf.ThreadPoolExecutor(max_workers=8) as ex:
            futs = [
                ex.submit(predict_remote, url, image=imgs[i], text=txts[i])
                for i in range(8)
            ]
            outs = [f.result(timeout=30) for f in futs]
        for i, out in enumerate(outs):
            np.testing.assert_allclose(
                out, pred(image=imgs[i], text=txts[i]), atol=1e-6
            )
        assert pred.calls - calls_before - 8 < 8  # coalesced
    finally:
        srv.stop()
        batcher.stop()


class TestExportedPredictor:
    """Frozen-artifact serving: export → load → identical outputs."""

    def test_export_roundtrip(self, predictor, tmp_path):
        from aecf_tpu.serve import export_predictor, load_exported_predictor

        rng = np.random.default_rng(1)
        img = rng.normal(size=(5, 32)).astype(np.float32)
        txt = rng.normal(size=(5, 16)).astype(np.float32)
        want = predictor(image=img, text=txt)  # also seeds _dims

        path = str(tmp_path / "frozen.npz")
        export_predictor(predictor, path)
        frozen = load_exported_predictor(path)

        got = frozen(image=img, text=txt)
        np.testing.assert_allclose(got, want, atol=1e-6)
        # missing-modality path works without ever seeing text (dims are
        # stored in the artifact, no warm call needed)
        np.testing.assert_allclose(
            frozen(image=img), predictor(image=img), atol=1e-6
        )
        # chunking across the largest bucket
        img_big = rng.normal(size=(70, 32)).astype(np.float32)
        txt_big = rng.normal(size=(70, 16)).astype(np.float32)
        np.testing.assert_allclose(
            frozen(image=img_big, text=txt_big),
            predictor(image=img_big, text=txt_big),
            atol=1e-6,
        )

    def test_reexport_of_frozen_predictor_fails_loud(
        self, predictor, tmp_path
    ):
        """A loaded artifact is type-compatible with export_predictor but
        has no live program to re-trace — must be a clear TypeError, not
        an AttributeError mid-export."""
        from aecf_tpu.serve import export_predictor, load_exported_predictor

        rng = np.random.default_rng(2)
        predictor(
            image=rng.normal(size=(2, 32)).astype(np.float32),
            text=rng.normal(size=(2, 16)).astype(np.float32),
        )  # seed dims
        path = str(tmp_path / "frozen.npz")
        export_predictor(predictor, path)
        frozen = load_exported_predictor(path)
        with pytest.raises(TypeError, match="re-export"):
            export_predictor(frozen, str(tmp_path / "frozen2.npz"))

    def test_export_requires_dims(self, tmp_path):
        from aecf_tpu.models import VisionLanguageModel
        from aecf_tpu.serve import export_predictor

        model = VisionLanguageModel(
            img_dim=32, txt_dim=16, hidden_dim=8, num_classes=5
        )
        params = model.init(jax.random.key(0))
        fresh = FusionPredictor(
            lambda p, image, text: model.apply(p, image, text,
                                               training=False),
            params, modality_names=("image", "text"), buckets=(8,),
        )
        with pytest.raises(ValueError, match="feature dims"):
            export_predictor(fresh, str(tmp_path / "x.npz"))
        # explicit dims work without a warm call
        export_predictor(
            fresh, str(tmp_path / "x.npz"),
            feature_dims={"image": 32, "text": 16},
        )


def test_export_roundtrip_on_tpu():
    """Frozen artifacts work against the live backend too (TPU-gated —
    the CPU suite covers the same path on CPU)."""
    if jax.default_backend() != "tpu":
        import pytest as _pytest

        _pytest.skip("needs a live TPU backend")
    from aecf_tpu.serve import export_predictor, load_exported_predictor

    model = VisionLanguageModel(
        img_dim=32, txt_dim=16, hidden_dim=8, num_classes=5
    )
    params = model.init(jax.random.key(0))
    pred = FusionPredictor(
        lambda p, image, text: model.apply(p, image, text, training=False),
        params, modality_names=("image", "text"), buckets=(8,),
    )
    rng = np.random.default_rng(0)
    img = rng.normal(size=(4, 32)).astype(np.float32)
    txt = rng.normal(size=(4, 16)).astype(np.float32)
    want = pred(image=img, text=txt)

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/frozen"  # suffix-less: exercises the .npz normalizer
        export_predictor(pred, path)
        frozen = load_exported_predictor(path)
        np.testing.assert_allclose(
            frozen(image=img, text=txt), want, atol=1e-6
        )


def test_microbatcher_rejects_malformed_without_wedging(predictor):
    """A 0-d/1-d modality must raise in the CALLER's thread — before the
    worker sees it — and the batcher must keep serving afterwards."""
    from aecf_tpu.serve import MicroBatcher

    batcher = MicroBatcher(predictor, max_batch=8, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="batch, features"):
            batcher(image=np.float32(3.0))
        with pytest.raises(ValueError, match="batch, features"):
            batcher(image=np.zeros(32, np.float32))
        rng = np.random.default_rng(0)
        out = batcher(
            image=rng.normal(size=(2, 32)).astype(np.float32),
            text=rng.normal(size=(2, 16)).astype(np.float32),
        )
        assert out.shape == (2, 5)  # worker alive and serving
    finally:
        batcher.stop()


def test_bad_width_first_request_does_not_poison(predictor):
    """Dims commit only after a successful device call: a wrong-width
    FIRST request for a modality must not leave its width recorded, or
    every later correct-width request would be rejected until restart."""
    model = VisionLanguageModel(
        img_dim=32, txt_dim=16, hidden_dim=8, num_classes=5
    )
    params = model.init(jax.random.key(0))

    def apply_fn(p, image, text):
        return model.apply(p, image, text, training=False)

    pred = FusionPredictor(
        apply_fn, params, modality_names=("image", "text"), buckets=(8,)
    )
    rng = np.random.default_rng(0)
    bad = rng.normal(size=(1, 7)).astype(np.float32)  # model expects 32
    good = rng.normal(size=(1, 32)).astype(np.float32)
    txt = rng.normal(size=(1, 16)).astype(np.float32)
    with pytest.raises(Exception):
        pred(image=bad, text=txt)
    out = pred(image=good, text=txt)  # must NOT raise "previously saw 7"
    assert out.shape == (1, 5)
    # and the committed dim is the one that actually worked
    assert pred._dims["image"] == 32
    with pytest.raises(ValueError, match="previously saw 32"):
        pred(image=bad, text=txt)


def test_predictor_rejects_non_2d(predictor):
    with pytest.raises(ValueError, match="batch, features"):
        predictor(image=np.zeros(32, np.float32))


def test_truncated_artifact_fails_loud(predictor, tmp_path):
    """A frozen artifact missing a bucket's program must fail at LOAD with
    a clear message, not with a KeyError at request time."""
    import json

    from aecf_tpu.serve import export_predictor, load_exported_predictor

    rng = np.random.default_rng(0)
    predictor(image=rng.normal(size=(2, 32)).astype(np.float32),
              text=rng.normal(size=(2, 16)).astype(np.float32))
    path = str(tmp_path / "frozen.npz")
    export_predictor(predictor, path)

    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files}
    # drop one bucket's program
    victim = next(k for k in arrays if k.startswith("bucket_"))
    del arrays[victim]
    trunc = str(tmp_path / "truncated.npz")
    np.savez(trunc, **arrays)

    with pytest.raises(ValueError, match="missing programs"):
        load_exported_predictor(trunc)


def test_non_artifact_npz_fails_loud(tmp_path):
    from aecf_tpu.serve import load_exported_predictor

    path = str(tmp_path / "random.npz")
    np.savez(path, foo=np.zeros(3))
    with pytest.raises(ValueError, match="not an export_predictor artifact"):
        load_exported_predictor(path)


def test_full_stack_frozen_batcher_http(predictor, tmp_path):
    """The complete deployment composition: frozen artifact → MicroBatcher
    → HTTP server → remote client."""
    from aecf_tpu.serve import (
        MicroBatcher,
        export_predictor,
        load_exported_predictor,
    )
    from aecf_tpu.serving_http import PredictionServer, predict_remote

    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 32)).astype(np.float32)
    txt = rng.normal(size=(3, 16)).astype(np.float32)
    want = predictor(image=img, text=txt)

    path = str(tmp_path / "frozen.npz")
    export_predictor(predictor, path)
    frozen = load_exported_predictor(path)
    batcher = MicroBatcher(frozen, max_batch=16, max_wait_ms=1.0)
    srv = PredictionServer(batcher, port=0).start()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        got = predict_remote(url, image=img, text=txt)
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        srv.stop()
        batcher.stop()


class TestShardedPredictor:
    """Multi-chip data-parallel serving: mesh= shards every bucket call's
    batch axis over the data axis (params replicated, GSPMD)."""

    @staticmethod
    def _make(mesh=None, buckets=(8, 32)):
        model = VisionLanguageModel(
            img_dim=32, txt_dim=16, hidden_dim=8, num_classes=5
        )
        params = model.init(jax.random.key(0))

        def apply_fn(p, image, text):
            return model.apply(p, image, text, training=False)

        return FusionPredictor(
            apply_fn,
            params,
            modality_names=("image", "text"),
            buckets=buckets,
            mesh=mesh,
        )

    def test_sharded_matches_single_device(self):
        mesh = jax.sharding.Mesh(
            np.array(jax.devices()[:4]).reshape(4), ("data",)
        )
        single = self._make()
        sharded = self._make(mesh=mesh)
        rng = np.random.default_rng(0)
        img = rng.normal(size=(21, 32)).astype(np.float32)
        txt = rng.normal(size=(21, 16)).astype(np.float32)
        want = single(image=img, text=txt)
        got = sharded(image=img, text=txt)  # ragged: pads to bucket 32
        np.testing.assert_allclose(got, want, atol=1e-5)
        # the compiled output really is sharded over the mesh
        out_dev = sharded._jitted(
            sharded.params,
            jax.numpy.asarray(np.concatenate([img, img[:11]])),
            jax.numpy.asarray(np.concatenate([txt, txt[:11]])),
        )
        assert len(out_dev.sharding.device_set) == 4

    def test_sharded_missing_modality_and_chunking(self):
        mesh = jax.sharding.Mesh(
            np.array(jax.devices()[:2]).reshape(2), ("data",)
        )
        sharded = self._make(mesh=mesh)
        single = self._make()
        rng = np.random.default_rng(1)
        img = rng.normal(size=(70, 32)).astype(np.float32)  # chunks: 32+32+8
        txt = rng.normal(size=(70, 16)).astype(np.float32)
        sharded(image=img[:2], text=txt[:2])  # teach dims
        single(image=img[:2], text=txt[:2])
        np.testing.assert_allclose(
            sharded(image=img), single(image=img), atol=1e-5
        )
        np.testing.assert_allclose(
            sharded(image=img, text=txt),
            single(image=img, text=txt),
            atol=1e-5,
        )

    def test_indivisible_bucket_rejected(self):
        mesh = jax.sharding.Mesh(
            np.array(jax.devices()[:4]).reshape(4), ("data",)
        )
        with pytest.raises(ValueError, match="not divisible"):
            self._make(mesh=mesh, buckets=(6, 32))
