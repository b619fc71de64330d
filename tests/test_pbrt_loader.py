"""`.pbrt` subset loader: parse a Cornell-like scene and render it."""
import numpy as np

from pbrt_tpu.pbrt_loader import load_pbrt
from pbrt_tpu.integrate import driver, direct
from pbrt_tpu.core import samplers as smp

SCENE = """
LookAt 0.5 0.5 1.42   0.5 0.5 -0.5   0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "lowdiscrepancy" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [4]
WorldBegin
  Material "matte" "rgb Kd" [0.73 0.73 0.73]
  Shape "trianglemesh" "point P" [0 0 0  1 0 0  1 0 -1  0 0 -1]
        "integer indices" [0 1 2 0 2 3]
  AttributeBegin
    Material "matte" "rgb Kd" [0.65 0.05 0.05]
    Shape "trianglemesh" "point P" [0 0 0  0 0 -1  0 1 -1  0 1 0]
          "integer indices" [0 1 2 0 2 3]
  AttributeEnd
  AttributeBegin
    Material "glass" "float eta" [1.5]
    Translate 0.5 0.25 -0.5
    Shape "sphere" "float radius" [0.2]
  AttributeEnd
  AttributeBegin
    AreaLightSource "diffuse" "rgb L" [10 10 10]
    Shape "trianglemesh" "point P" [0.3 0.99 -0.3  0.3 0.99 -0.7  0.7 0.99 -0.7  0.7 0.99 -0.3]
          "integer indices" [0 1 2 0 2 3]
  AttributeEnd
  LightSource "point" "point from" [0.5 0.9 0.2] "rgb I" [0.3 0.3 0.3]
WorldEnd
"""


def test_load_and_render(tmp_path):
    p = tmp_path / "scene.pbrt"
    p.write_text(SCENE)
    scene, camera, opts = load_pbrt(str(p))
    assert opts["integrator"] == "path"
    assert opts["max_depth"] == 4
    assert opts["spp"] == 4
    assert camera.resolution == (24, 24)
    assert int(scene.lights.count) == 2
    assert int(scene.quad.count) == 1

    cfg = driver.RenderConfig(width=24, height=24, spp=2,
                              sampler=smp.SamplerConfig(kind=opts["sampler"], spp=2))
    img = np.asarray(driver.render(scene, camera, cfg, direct.make_li(cfg)))
    assert np.isnan(img).sum() == 0
    assert img.mean() > 0.01
