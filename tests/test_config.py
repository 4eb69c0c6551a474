"""cfg parser + ModelSpec tests (SURVEY.md §4.2; reference component §2.1 #1-2)."""

import pytest

from pytorch_yolo_tpu.config import (
    ConfigError,
    ConvSpec,
    MaxPoolSpec,
    RouteSpec,
    ShortcutSpec,
    UpsampleSpec,
    YoloSpec,
    build_spec,
    head_strides,
    parse_cfg_text,
)
from pytorch_yolo_tpu.models.zoo import model_spec, yolov3_cfg, yolov3_tiny_cfg

TINY_CFG = yolov3_tiny_cfg()
FULL_CFG = yolov3_cfg()


def test_tokenizer_basics():
    blocks = parse_cfg_text(
        """
        # comment
        [net]
        width=416
        height = 320

        [convolutional]
        filters=32
        size=3
        stride=1
        pad=1
        activation=leaky
        """
    )
    assert blocks[0]["type"] == "net"
    assert blocks[0]["width"] == "416"
    assert blocks[0]["height"] == "320"
    assert blocks[1]["type"] == "convolutional"
    assert blocks[1]["filters"] == "32"


def test_tokenizer_errors():
    with pytest.raises(ConfigError):
        parse_cfg_text("")
    with pytest.raises(ConfigError):
        parse_cfg_text("key=1\n[net]\n")
    with pytest.raises(ConfigError):
        parse_cfg_text("[net\nwidth=416")
    with pytest.raises(ConfigError):
        parse_cfg_text("[net]\nnoequals")


def test_tiny_spec_structure():
    spec = model_spec("yolov3-tiny")
    assert len(spec.layers) == 24
    assert isinstance(spec.layers[0], ConvSpec) and spec.layers[0].filters == 16
    assert isinstance(spec.layers[11], MaxPoolSpec)
    assert spec.layers[11].size == 2 and spec.layers[11].stride == 1  # the quirk layer
    assert isinstance(spec.layers[16], YoloSpec)
    assert isinstance(spec.layers[17], RouteSpec) and spec.layers[17].layers == (13,)
    assert isinstance(spec.layers[19], UpsampleSpec)
    assert isinstance(spec.layers[20], RouteSpec) and spec.layers[20].layers == (19, 8)
    assert isinstance(spec.layers[23], YoloSpec)
    # masked anchors: first head gets mask 3,4,5
    assert spec.layers[16].anchors == ((81, 82), (135, 169), (344, 319))
    assert spec.layers[23].anchors == ((10, 14), (23, 27), (37, 58))
    assert head_strides(spec) == (32, 16)
    assert spec.out_channels[20] == 128 + 256  # route concat arity


def test_full_spec_structure():
    spec = model_spec("yolov3")
    assert len(spec.layers) == 107
    convs = [l for l in spec.layers if isinstance(l, ConvSpec)]
    assert len(convs) == 75
    shortcuts = [l for l in spec.layers if isinstance(l, ShortcutSpec)]
    assert len(shortcuts) == 23  # 1+2+8+8+4 residual units
    heads = spec.yolo_layers
    assert len(heads) == 3
    assert head_strides(spec) == (32, 16, 8)
    assert heads[0].anchors == ((116, 90), (156, 198), (373, 326))
    assert heads[2].anchors == ((10, 13), (16, 30), (33, 23))
    # upstream route targets fall out of generation arithmetic
    routes = [l for l in spec.layers if isinstance(l, RouteSpec)]
    assert (19, 61) in [r.layers for r in routes if len(r.layers) == 2][:1] or True
    two_routes = [r.layers for r in routes if len(r.layers) == 2]
    assert two_routes[0][1] == 61 and two_routes[1][1] == 36


@pytest.mark.parametrize("name,size,expect", [
    ("yolov3", 416, 10647),
    ("yolov3", 320, 6300),
    ("yolov3", 608, 22743),
    ("yolov3-tiny", 416, 2535),
    ("yolov3-tiny", 320, 1500),
])
def test_detection_counts(name, size, expect):
    # SURVEY.md §3.3/§3.6 shape ledger
    assert model_spec(name).num_detections(size) == expect


def test_route_shortcut_resolution_errors():
    with pytest.raises(ConfigError):
        build_spec(parse_cfg_text("[net]\nwidth=32\nheight=32\n[route]\nlayers=-1\n"))
    # shortcut channel mismatch
    bad = """
    [net]
    width=32
    height=32
    [convolutional]
    filters=8
    size=3
    stride=1
    pad=1
    activation=leaky
    [convolutional]
    filters=16
    size=3
    stride=1
    pad=1
    activation=leaky
    [shortcut]
    from=-2
    """
    with pytest.raises(ConfigError):
        build_spec(parse_cfg_text(bad))


def test_yolo_channel_validation():
    bad = """
    [net]
    width=32
    height=32
    [convolutional]
    filters=16
    size=1
    stride=1
    pad=1
    activation=linear
    [yolo]
    mask=0
    anchors=10,14
    classes=80
    num=1
    """
    with pytest.raises(ConfigError):
        build_spec(parse_cfg_text(bad))  # 16 != 1*(5+80)


def test_spp_spec_structure():
    spec = model_spec("yolov3-spp")
    assert len(spec.layers) == 114
    assert head_strides(spec) == (32, 16, 8)
    assert spec.num_detections(416) == 10647
    pools = [l for l in spec.layers if isinstance(l, MaxPoolSpec)]
    assert [(p.size, p.stride) for p in pools] == [(5, 1), (9, 1), (13, 1)]
    four_way = [l for l in spec.layers if isinstance(l, RouteSpec) and len(l.layers) == 4]
    assert len(four_way) == 1
    assert spec.out_channels[four_way[0].index] == 2048


def test_parser_fuzz_no_crashes():
    """Garbage cfg input must raise ConfigError (or parse), never crash."""
    import random

    rng = random.Random(0)
    tokens = ["[net]", "[convolutional]", "[yolo]", "[route]", "[shortcut]",
              "filters=8", "size=3", "stride=1", "pad=1", "activation=leaky",
              "layers=-1", "from=-2", "mask=0", "anchors=1,2", "classes=80",
              "width=32", "height=32", "###", "= =", "[", "]", "x=y=z", ""]
    for trial in range(200):
        text = "\n".join(rng.choice(tokens) for _ in range(rng.randint(1, 25)))
        try:
            build_spec(parse_cfg_text(text))
        except ConfigError:
            pass  # expected failure mode
        except (ValueError, KeyError) as e:
            raise AssertionError(f"trial {trial}: non-ConfigError {type(e).__name__}: {e}\n{text}")


def test_yolov2_spec_structure():
    from pytorch_yolo_tpu.config import RegionSpec, ReorgSpec

    spec = model_spec("yolov2")
    assert len(spec.layers) == 32  # upstream yolov2.cfg layer count
    reorgs = [l for l in spec.layers if isinstance(l, ReorgSpec)]
    assert len(reorgs) == 1 and reorgs[0].stride == 2
    # reorg: 64ch 26x26 -> 256ch, concat with 1024 trunk -> 1280
    r = reorgs[0]
    assert spec.out_channels[r.index] == 256
    assert spec.out_channels[r.index + 1] == 1280
    head = spec.yolo_layers[0]
    assert isinstance(head, RegionSpec)
    assert head.num == len(head.anchors) == 5
    assert head.classes == 80 and head.softmax
    assert head.anchors[0] == (0.57273, 0.677385)  # grid-cell units
    assert head_strides(spec) == (32,)
    assert spec.num_detections(416) == 845  # 13*13*5
    assert model_spec("yolov2-tiny").num_detections(608) == 1805  # 19*19*5


def test_reorg_region_validation():
    pre = "[net]\nwidth=32\nheight=32\n[convolutional]\nfilters=6\nsize=3\nstride=1\npad=1\nactivation=leaky\n"
    with pytest.raises(ConfigError):  # 6 channels not divisible by 4
        build_spec(parse_cfg_text(pre + "[reorg]\nstride=2\n"))
    with pytest.raises(ConfigError):  # reverse unsupported
        build_spec(parse_cfg_text(
            pre.replace("filters=6", "filters=8") + "[reorg]\nstride=2\nreverse=1\n"))
    with pytest.raises(ConfigError):  # num != anchor count
        build_spec(parse_cfg_text(
            pre + "[region]\nanchors=1,1, 2,2\nnum=5\nclasses=1\n"))
    # valid minimal region: conv emits num*(5+classes) = 2*6 = 12 channels
    ok = build_spec(parse_cfg_text(
        pre.replace("filters=6", "filters=12")
        + "[region]\nanchors=1,1, 2,2\nnum=2\nclasses=1\n"))
    assert ok.num_detections(32) == 2 * 32 * 32  # stride-1 conv: 32x32 grid
    with pytest.raises(ConfigError):  # channel mismatch with the conv
        build_spec(parse_cfg_text(
            pre + "[region]\nanchors=1,1, 2,2\nnum=2\nclasses=1\n"))


def test_yolov4_spec_structure():
    """CSP backbone wiring: upstream yolov4.cfg layer indices fall out of the
    generator arithmetic (stage ends 54/85, backbone end 104, 162 layers)."""
    spec = model_spec("yolov4")
    assert len(spec.layers) == 162
    convs = [l for l in spec.layers if isinstance(l, ConvSpec)]
    assert len(convs) == 110  # upstream yolov4 conv count
    assert {c.activation for c in convs} == {"mish", "leaky", "linear"}
    # backbone is mish, neck/head leaky, outputs linear
    assert all(c.activation == "mish" for c in convs if c.index <= 104)
    shortcuts = [l for l in spec.layers if isinstance(l, ShortcutSpec)]
    assert len(shortcuts) == 23  # 1+2+8+8+4 CSP residual units
    assert head_strides(spec) == (8, 16, 32)
    heads = spec.yolo_layers
    assert [h.scale_x_y for h in heads] == [1.2, 1.1, 1.05]
    assert heads[0].anchors == ((12, 16), (19, 36), (40, 28))
    assert heads[2].anchors == ((142, 110), (192, 243), (459, 401))
    assert spec.num_detections(416) == 10647
    assert spec.num_detections(608) == 22743
    # SPP concat present (2048ch), PAN fusion routes hit stage ends 54/85
    routes = [l for l in spec.layers if isinstance(l, RouteSpec)]
    assert any(spec.out_channels[r.index] == 2048 for r in routes)
    singles = [r.layers[0] for r in routes if len(r.layers) == 1]
    assert 85 in singles and 54 in singles


def test_yolov4_tiny_spec_structure():
    spec = model_spec("yolov4-tiny")
    assert len(spec.layers) == 38
    split_routes = [l for l in spec.layers
                    if isinstance(l, RouteSpec) and l.groups > 1]
    assert len(split_routes) == 3
    for r in split_routes:
        assert r.groups == 2 and r.group_id == 1
        # split halves the source's channels
        assert spec.out_channels[r.index] == spec.out_channels[r.layers[0]] // 2
    assert head_strides(spec) == (32, 16)
    assert [h.scale_x_y for h in spec.yolo_layers] == [1.05, 1.05]
    # upstream masks {3,4,5}/{1,2,3} on the v3-tiny anchor table
    assert spec.yolo_layers[0].mask == (3, 4, 5)
    assert spec.yolo_layers[1].mask == (1, 2, 3)
    assert spec.yolo_layers[1].anchors == ((23, 27), (37, 58), (81, 82))
    assert spec.num_detections(416) == 2535


def test_route_groups_validation():
    base = """
    [net]
    width=32
    height=32
    [convolutional]
    filters=8
    size=3
    stride=1
    pad=1
    activation=leaky
    [route]
    layers=-1
    {extra}
    """
    # group_id out of range
    with pytest.raises(ConfigError):
        build_spec(parse_cfg_text(base.format(extra="groups=2\ngroup_id=2")))
    # channels not divisible by groups
    with pytest.raises(ConfigError):
        build_spec(parse_cfg_text(base.format(extra="groups=3\ngroup_id=0")))
    # valid split halves the channels
    spec = build_spec(parse_cfg_text(base.format(extra="groups=2\ngroup_id=1")))
    assert spec.out_channels[1] == 4


def test_mish_activation_accepted_unknown_rejected():
    txt = """
    [net]
    width=32
    height=32
    [convolutional]
    filters=8
    size=3
    stride=1
    pad=1
    activation={act}
    """
    spec = build_spec(parse_cfg_text(txt.format(act="mish")))
    assert spec.layers[0].activation == "mish"
    with pytest.raises(ConfigError):
        build_spec(parse_cfg_text(txt.format(act="swish")))


def test_every_zoo_model_builds_and_committed_cfgs_are_current():
    """Whole-zoo smoke: every generator parses+builds, and the committed
    cfg/<name>.cfg files are byte-current with their generators (a stale
    committed cfg would silently ship a different topology than the zoo)."""
    import os

    from pytorch_yolo_tpu.models.zoo import _GENERATORS, available_models, model_spec
    from pytorch_yolo_tpu.weights import param_count

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cfg")
    for name in available_models():
        spec = model_spec(name)
        assert spec.layers and param_count(spec) > 0, name
        strides = sorted({y.stride for y in spec.yolo_layers
                          if hasattr(y, "stride")})  # RegionSpec (v2) has none
        assert all(s in (8, 16, 32, 64, 128) for s in strides), (name, strides)
        committed = os.path.join(cfg_dir, f"{name}.cfg")
        assert os.path.exists(committed), f"cfg/{name}.cfg not committed"
        disk = open(committed).read().rstrip("\n")
        assert disk == _GENERATORS[name](classes=80).rstrip("\n"), \
            f"cfg/{name}.cfg is stale — regenerate with write_cfg({name!r}, ...)"
