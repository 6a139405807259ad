"""Interactive HTML viewer export (common/viewer.py:42-301 substitute)."""

import base64
import json
import re

import numpy as np

from hold_tpu.render.html_viewer import export_html_viewer, pack_scene


def _tiny_scene(F=5, V=12, T=16):
    rng = np.random.RandomState(0)
    verts = rng.randn(F, V, 3).astype(np.float32) * 0.1
    faces = rng.randint(0, V, (T, 3)).astype(np.int64)
    w2c = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    w2c[:, 2, 3] = 0.6
    K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]])
    imgs = [np.full((60, 80, 3), 90, np.uint8) for _ in range(F)]
    return verts, faces, w2c, K, imgs


def test_pack_scene_roundtrip():
    verts, faces, w2c, K, imgs = _tiny_scene()
    blob = pack_scene({"right": (verts, faces)}, w2c, K, (60, 80), images=imgs)
    assert blob["n_frames"] == 5
    node = blob["nodes"][0]
    v = np.frombuffer(base64.b64decode(node["verts_b64"]), np.float32)
    np.testing.assert_allclose(v.reshape(verts.shape), verts)
    f = np.frombuffer(base64.b64decode(node["faces_b64"]), np.uint32)
    np.testing.assert_array_equal(f.reshape(-1, 3), faces)
    assert len(blob["billboards"]) == 5 and blob["billboards"][0]


def test_pack_scene_frame_stride():
    verts, faces, w2c, K, imgs = _tiny_scene(F=5)
    blob = pack_scene({"right": (verts, faces)}, w2c, K, (60, 80),
                      images=imgs, max_frames=3)
    assert blob["n_frames"] == 3
    assert blob["frame_ids"] == [0, 2, 4]


def test_export_html_is_self_contained(tmp_path):
    verts, faces, w2c, K, imgs = _tiny_scene()
    blob = pack_scene({"right": (verts, faces)}, w2c, K, (60, 80), images=imgs)
    p = export_html_viewer(str(tmp_path / "v.html"), blob, title="t")
    html = open(p).read()
    # no external resources: self-contained means no http(s) fetches
    assert not re.search(r'src="https?://|href="https?://', html)
    # the scene blob embedded and parseable
    m = re.search(r"const SCENE = (\{.*?\});\n", html, re.S)
    assert m, "SCENE blob not found"
    parsed = json.loads(m.group(1))
    assert parsed["n_frames"] == 5
    assert "webgl2" in html


def test_export_html_interactive_controls(tmp_path):
    """Viewer workflow parity (reference common/viewer.py:42-301): frame
    scrub + play, per-entity visibility toggles, view-from-training-camera,
    billboard + camera-frusta toggles, keyboard scrubbing."""
    verts, faces, w2c, K, imgs = _tiny_scene()
    blob = pack_scene(
        {"right": (verts, faces), "object": (verts, faces)},
        w2c, K, (60, 80), images=imgs,
    )
    p = export_html_viewer(str(tmp_path / "v.html"), blob)
    html = open(p).read()
    for ctrl in ('id="frame"', 'id="play"', 'id="bb"', 'id="cams"',
                 'id="follow"', 'id="ents"', "ArrowRight", "ArrowLeft"):
        assert ctrl in html, f"missing control {ctrl}"
    # per-entity toggles are built from SCENE.nodes at runtime; both node
    # ids must be present in the embedded blob
    ids = [n["id"] for n in json.loads(
        re.search(r"const SCENE = (\{.*?\});\n", html, re.S).group(1)
    )["nodes"]]
    assert ids == ["right", "object"]
    # sanity: script block has balanced braces/parens (catches template
    # edit slips without a JS engine in the image)
    script = html.split("<script>")[1].split("</script>")[0]
    body = re.sub(r"const SCENE = \{.*?\};\n", "", script, flags=re.S)
    for o, c in ("{}", "()", "[]"):
        assert body.count(o) == body.count(c), f"unbalanced {o}{c}"
