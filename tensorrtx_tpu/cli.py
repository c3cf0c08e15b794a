"""Command-line interface — the analog of the reference's per-model binaries.

Reference CLI (yolo11/yolo11_det.cpp:115-160):
    ./yolo11_det -s yolo11n.wts yolo11n.engine n     # build
    ./yolo11_det -d yolo11n.engine ../images g       # run

Ours (one CLI, models are registry entries):
    python -m tensorrtx_tpu.cli build yolo11 -w y.wts -o y.engine \
        --precision bf16 --set scale=n [--int8-calib-dir DIR]
    python -m tensorrtx_tpu.cli run y.engine IMAGE_DIR [--batch 4]
    python -m tensorrtx_tpu.cli list
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _parse_set(kvs):
    out = {}
    for kv in kvs or []:
        k, v = kv.split("=", 1)
        for cast in (int, float):
            try:
                v = cast(v)
                break
            except ValueError:
                continue
        out[k] = v
    return out


def cmd_build(args):
    from tensorrtx_tpu.core.engine import build_engine

    overrides = _parse_set(args.set)
    eng = build_engine(args.model, args.wts, precision=args.precision,
                       **overrides)
    if args.int8_calib_dir:
        import numpy as np

        from tensorrtx_tpu.core.quant import (QuantizedEngine, calibrate,
                                              save_scale_cache)
        from tensorrtx_tpu.core.runner import load_image, read_files_in_dir
        from tensorrtx_tpu.ops.preprocess import letterbox
        import jax.numpy as jnp

        h, w, _ = eng.model.input_shape(eng.cfg)
        files = read_files_in_dir(args.int8_calib_dir)[:args.calib_images]
        batches = []
        for f in files:
            im = load_image(f)
            x = np.asarray(letterbox(jnp.asarray(im), im.shape[0], im.shape[1],
                                     h, w))
            batches.append(x[None])
        scales = calibrate(eng, batches, method=args.calib_method)
        qeng = QuantizedEngine(eng, scales)
        qeng.save(args.output)
        print(f"int8 engine saved → {args.output} "
              f"(calib table int8calib.json inside)")
        return
    eng.save(args.output, export_aot=getattr(args, "aot", False))
    print(f"engine saved → {args.output}"
          + (" (with AOT program)" if getattr(args, "aot", False) else ""))


def cmd_run(args):
    import numpy as np

    from tensorrtx_tpu.core.engine import enable_persistent_cache, load_engine
    from tensorrtx_tpu.core.runner import (ServingPipeline, load_image,
                                           read_files_in_dir)

    from tensorrtx_tpu.core.tasks import run_task, task_for

    import os as _os

    # engine-local executable cache: first run compiles, later runs
    # deserialize (the -d fast path; TRT deserializeCudaEngine analog)
    enable_persistent_cache(_os.path.join(args.engine, "xla_cache"))
    eng = load_engine(args.engine)
    import os

    files = ([args.image_dir] if os.path.isfile(args.image_dir)
             else read_files_in_dir(args.image_dir))
    if not files:
        print(f"no images in {args.image_dir}", file=sys.stderr)
        return 1
    imgs = [load_image(f) for f in files]
    task = task_for(eng.model.name)
    dp, tp, pp = (getattr(args, k, 1) or 1 for k in ("dp", "tp", "pp"))
    t0 = time.perf_counter()
    if pp > 1:
        return _run_gpipe(eng, files, imgs, task, pp, t0)
    if dp * tp > 1:
        return _run_mesh(eng, files, imgs, task, dp, tp, args.batch, t0)
    if task == "detect":
        max_h = max(i.shape[0] for i in imgs)
        max_w = max(i.shape[1] for i in imgs)
        pipe = ServingPipeline(eng, src_h=max_h, src_w=max_w, donate=False)
        for i in range(0, len(imgs), args.batch):
            chunk = imgs[i:i + args.batch]
            res = pipe.detect_images(chunk)
            for f, r in zip(files[i:i + args.batch], res):
                dets = [{"box": [round(float(v), 1) for v in b],
                         "score": round(float(s), 3), "class": int(c)}
                        for b, s, c in zip(r["boxes"], r["scores"],
                                           r["classes"])]
                print(json.dumps({"image": f, "detections": dets}))
    else:
        for f, img in zip(files, imgs):
            out = run_task(eng, img)
            print(json.dumps({"image": f, **out}, ensure_ascii=False))
    dt = time.perf_counter() - t0
    print(f"# {len(imgs)} images in {dt * 1e3:.1f} ms", file=sys.stderr)
    return 0


def _print_dets(f, r):
    dets = [{"box": [round(float(v), 1) for v in b],
             "score": round(float(s), 3), "class": int(c)}
            for b, s, c in zip(r["boxes"], r["scores"], r["classes"])]
    print(json.dumps({"image": f, "detections": dets}))


def _run_mesh(eng, files, imgs, task, dp, tp, batch, t0):
    """`cli run --dp/--tp`: one GSPMD serving program over a device mesh —
    the TPU answer to the reference's per-GPU engine copies
    (tutorials/multi_GPU_processing.md:13-30)."""
    import jax

    from tensorrtx_tpu.parallel import (MeshServingPipeline,
                                        MeshTaskPipeline, make_mesh)

    n = dp * tp
    if len(jax.devices()) < n:
        print(f"dp*tp={n} but only {len(jax.devices())} devices visible "
              "(for a virtual mesh set JAX_PLATFORMS=cpu and XLA_FLAGS="
              f"--xla_force_host_platform_device_count={n})",
              file=sys.stderr)
        return 1
    mesh = make_mesh(n, dp=dp, tp=tp)
    step = max(batch, dp)
    if task == "detect":
        max_h = max(i.shape[0] for i in imgs)
        max_w = max(i.shape[1] for i in imgs)
        pipe = MeshServingPipeline(eng, mesh, src_h=max_h, src_w=max_w)
        for i in range(0, len(imgs), step):
            res = pipe.detect_images(imgs[i:i + step])
            for f, r in zip(files[i:i + step], res):
                _print_dets(f, r)
    else:
        # classify/seg/OCR/sr/embedding/tensor: per-task preprocess feeds
        # the dp-batch-sharded apply (MeshTaskPipeline)
        pipe = MeshTaskPipeline(eng, mesh)
        for i in range(0, len(imgs), step):
            res = pipe.run_images(imgs[i:i + step])
            for f, r in zip(files[i:i + step], res):
                print(json.dumps({"image": f, **r}, ensure_ascii=False))
    dt = time.perf_counter() - t0
    print(f"# {len(imgs)} images in {dt * 1e3:.1f} ms on dp={dp} tp={tp}",
          file=sys.stderr)
    return 0


def _run_gpipe(eng, files, imgs, task, pp, t0):
    """`cli run --pp`: GPipe stage-per-chip inference for uniform-block
    models (parallel/gpipe.gpipe_serving_step)."""
    import numpy as np

    import jax

    from tensorrtx_tpu.core.tasks import PREPROCESS, PRESENT

    if len(jax.devices()) < pp:
        print(f"pp={pp} but only {len(jax.devices())} devices visible "
              "(for a virtual mesh set JAX_PLATFORMS=cpu and XLA_FLAGS="
              f"--xla_force_host_platform_device_count={pp})",
              file=sys.stderr)
        return 1
    from jax.sharding import Mesh

    from tensorrtx_tpu.parallel.gpipe import gpipe_serving_step

    mesh = Mesh(np.array(jax.devices()[:pp]), ("pp",))
    gstep = gpipe_serving_step(eng, mesh)  # raises if no gpipe_split
    from tensorrtx_tpu.core.tasks import pre_segment, present_tensor

    # detect-task pipelined models (detr) fall back to the generic
    # imagenet-resize preprocess + tensor-stats present: the pp path
    # returns the raw head outputs, not the fused NMS buffer
    pre = PREPROCESS.get(task, pre_segment)
    present = PRESENT.get(task, present_tensor)
    xs, metas = [], []
    for img in imgs:
        x, meta = pre(img, eng.model, eng.cfg)
        xs.append(np.asarray(x)[0])
        metas.append(meta)
    out = jax.tree.map(np.asarray, gstep(np.stack(xs)))
    for f, meta, i in zip(files, metas, range(len(imgs))):
        one = jax.tree.map(lambda a: a[i:i + 1], out)
        res = present(one, eng.cfg, meta)
        print(json.dumps({"image": f, **res}, ensure_ascii=False))
    dt = time.perf_counter() - t0
    print(f"# {len(imgs)} images in {dt * 1e3:.1f} ms on pp={pp}",
          file=sys.stderr)
    return 0


def cmd_list(args):
    from tensorrtx_tpu.core.registry import list_models

    for m in list_models():
        print(m)


def cmd_ppocr(args):
    """Multi-mode PP-OCRv5 system (≙ ppocr_system.cpp modes)."""
    import numpy as np

    from tensorrtx_tpu.core.runner import load_image
    from tensorrtx_tpu.pipelines import ppocr_system as S

    files = S.read_images(args.image_path)
    if not files:
        print(f"no images in {args.image_path}", file=sys.stderr)
        return 1
    modes = (["ocr", "classify", "layout", "table", "uvdoc", "formula"]
             if args.mode == "all" else [args.mode])
    wts = _parse_wts_map(args.wts)

    for mode in modes:
        if mode == "ocr":
            variant = "server" if args.variant == "s" else "mobile"
            det_name = ("ppocrv5_server_det" if variant == "server"
                        else "ppocrv5_det")
            rec_name = ("ppocrv5_server_rec" if variant == "server"
                        else "ppocrv5_rec")
            det = S.build_model(det_name, wts.get(det_name))
            rec = S.build_model(rec_name, wts.get(rec_name))
            if args.dict:
                dictionary = S.load_rec_dictionary(args.dict)
            else:
                dictionary = [chr(c) for c in range(33, 127)]
                print("# no --dict: using ascii fallback charset",
                      file=sys.stderr)
            for f in files:
                img = np.asarray(load_image(f))
                for line in S.run_ocr(det, rec, img, dictionary):
                    box = [[round(float(v), 1) for v in pt]
                           for pt in line.box]
                    print(json.dumps({"image": f, "mode": "ocr", "box": box,
                                      "text": line.text,
                                      "conf": round(line.confidence, 4)},
                                     ensure_ascii=False))
        elif mode == "formula":
            from tensorrtx_tpu.pipelines.formula import (FormulaPipeline,
                                                         FormulaTokenizer)

            eng = S.build_model("pp_formulanet_plus_l",
                                wts.get("pp_formulanet_plus_l"))
            tok = FormulaTokenizer(yaml_path=args.formula_yaml) \
                if args.formula_yaml else FormulaTokenizer(vocab={})
            pipe = FormulaPipeline(eng, tok)
            for f in files:
                img = np.asarray(load_image(f))
                r = pipe(img)
                print(json.dumps({"image": f, "mode": "formula",
                                  "tokens": r["tokens"],
                                  "latex": r["latex"]}, ensure_ascii=False))
        else:
            for name in S.MODE_MODELS[mode]:
                eng = S.build_model(name, wts.get(name))
                for f in files:
                    img = np.asarray(load_image(f))
                    out = S.run_generic(eng, name, img)
                    print(json.dumps({"image": f, "mode": mode,
                                      "model": name,
                                      "summary": S.summarize(out)
                                      if not isinstance(out, (list, dict))
                                      else str(out)[:400]},
                                     ensure_ascii=False))
    return 0


def _parse_wts_map(kvs):
    """--wts model=path pairs → dict (absent models run random weights)."""
    out = {}
    for kv in kvs or []:
        k, v = kv.split("=", 1)
        out[k] = v
    return out


def cmd_dump(args):
    from tensorrtx_tpu.tools.dump import compare_dumps, run_dump

    if args.compare:
        report = compare_dumps(args.prefix, args.compare,
                               max_abs=args.max_abs)
        print(json.dumps(report, indent=2))
        return 0 if report["pass"] else 1
    manifest = run_dump(args.model, args.prefix, wts=args.wts,
                        input_npy=args.input, **_parse_set(args.set))
    print(json.dumps(manifest, indent=2))
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tensorrtx_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help=".wts → engine (≙ -s)")
    b.add_argument("model")
    b.add_argument("-w", "--wts", required=True)
    b.add_argument("-o", "--output", required=True)
    b.add_argument("--precision", default="fp32",
                   choices=["fp32", "bf16", "fp16"])
    b.add_argument("--set", action="append", metavar="KEY=VAL",
                   help="config override, e.g. --set scale=n")
    b.add_argument("--aot", action="store_true",
                   help="also serialize the jax.export AOT program (batch 1)")
    b.add_argument("--int8-calib-dir")
    b.add_argument("--calib-method", default="entropy",
                   choices=["entropy", "percentile", "absmax"])
    b.add_argument("--calib-images", type=int, default=64)
    b.set_defaults(fn=cmd_build)

    r = sub.add_parser("run", help="engine + image dir → detections (≙ -d)")
    r.add_argument("engine")
    r.add_argument("image_dir")
    r.add_argument("--batch", type=int, default=1)
    r.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh axis: frames batch-sharded over "
                   "dp chips (≙ the reference's one-engine-per-GPU recipe, "
                   "as one GSPMD program)")
    r.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh axis: weights channel-sharded "
                   "over tp chips (a sharding report is logged)")
    r.add_argument("--pp", type=int, default=1,
                   help="GPipe pipeline stages for uniform-block models "
                   "(vit): one encoder stage per chip")
    r.set_defaults(fn=cmd_run)

    l = sub.add_parser("list", help="list registered models")
    l.set_defaults(fn=cmd_list)

    p = sub.add_parser("ppocr", help="PP-OCRv5 system (≙ ppocr_system)")
    p.add_argument("mode", choices=["ocr", "classify", "layout", "table",
                                    "uvdoc", "formula", "all"])
    p.add_argument("image_path")
    p.add_argument("--variant", default="m", choices=["m", "s"],
                   help="OCR det/rec variant: m(obile) or s(erver)")
    p.add_argument("--wts", action="append", metavar="MODEL=PATH",
                   help="per-model .wts (default: random weights, smoke)")
    p.add_argument("--dict", help="rec dictionary txt/yml")
    p.add_argument("--formula-yaml", help="FormulaNet tokenizer yaml")
    p.set_defaults(fn=cmd_ppocr)

    g = sub.add_parser(
        "gen-wts", help="checkpoint (.pt/.pth/.npz/paddle dir/mxnet .params/"
        "TF ckpt) → .wts (≙ gen_wts.py)")
    g.add_argument("-w", "--weights", required=True)
    g.add_argument("-o", "--output", required=True)
    g.add_argument("--format", default="auto",
               choices=["auto", "torch", "npz", "paddle", "mxnet", "tf"])
    g.add_argument("--exclude", default="")
    g.add_argument("--strip-prefix", default="")

    def cmd_gen_wts(args):
        from tensorrtx_tpu.tools.gen_wts import convert

        n = convert(args.weights, args.output, args.format, args.exclude,
                    args.strip_prefix)
        print(f"wrote {n} tensors to {args.output}")
        return 0

    g.set_defaults(fn=cmd_gen_wts)

    d = sub.add_parser("dump", help="tensor-dump parity tool (≙ ppocrv5_dump)")
    d.add_argument("model")
    d.add_argument("prefix", help="output prefix (writes .npz + .json)")
    d.add_argument("-w", "--wts")
    d.add_argument("--input", help=".npy input instead of synthetic")
    d.add_argument("--compare", metavar="OTHER_PREFIX",
                   help="diff against another dump instead of running")
    d.add_argument("--max-abs", type=float, default=0.2)
    d.add_argument("--set", action="append", metavar="KEY=VAL")
    d.set_defaults(fn=cmd_dump)

    sm = sub.add_parser(
        "smoke", help="compile+run EVERY registered model on the device "
        "(≙ the reference's per-model `-d` acceptance step); writes "
        "TPU_SMOKE.md/.jsonl at the repo root")
    sm.add_argument("--only", nargs="*", default=None)
    sm.add_argument("--resume", action="store_true")
    sm.add_argument("--report", action="store_true")

    def cmd_smoke(args):
        from tensorrtx_tpu.tools.tpu_smoke import main as smoke_main

        argv2 = []
        if args.only:
            argv2 += ["--only", *args.only]
        if args.resume:
            argv2.append("--resume")
        if args.report:
            argv2.append("--report")
        return smoke_main(argv2)

    sm.set_defaults(fn=cmd_smoke)

    v = sub.add_parser(
        "validate", help="real-weights acceptance: build → infer → "
        "compare-to-expected, one command (≙ tutorials/getting_started.md"
        ":85-105 'the output should be same')")
    v.add_argument("model")
    v.add_argument("-w", "--wts", required=True)
    v.add_argument("--image", required=True)
    v.add_argument("--expect", help="expected-output JSON to compare against")
    v.add_argument("--save-expected", metavar="PATH",
                   help="write the expected-output fixture instead")
    v.add_argument("--precision", default="fp32",
                   choices=["fp32", "bf16", "fp16"])
    v.add_argument("--set", action="append", metavar="KEY=VAL")

    def cmd_validate(args):
        from tensorrtx_tpu.tools.validate import run_validate

        ok, report = run_validate(
            args.model, args.wts, args.image, expect=args.expect,
            save_expected=args.save_expected, precision=args.precision,
            overrides=_parse_set(args.set))
        print(json.dumps(report, indent=1))
        print("PASS" if ok else "FAIL", file=sys.stderr)
        return 0 if ok else 1

    v.set_defaults(fn=cmd_validate)

    pr = sub.add_parser(
        "precision-report",
        help="empirical tier-support probe + conv-tier crossover table "
        "(≙ tutorials/check_fp16_int8_support.md, measured on the chip)")
    pr.add_argument("--json", action="store_true")
    pr.add_argument("--quick", action="store_true")

    def cmd_precision_report(args):
        from tensorrtx_tpu.tools.precision_report import main as prmain

        return prmain((["--json"] if args.json else [])
                      + (["--quick"] if args.quick else []))

    pr.set_defaults(fn=cmd_precision_report)

    s2 = sub.add_parser(
        "perf-sweep",
        help="per-model latency sweep vs published TRT tables (→ PERF.md)")

    def cmd_perf_sweep(_args):
        from tensorrtx_tpu.tools.perf_sweep import main as sweep_main

        return sweep_main() or 0

    s2.set_defaults(fn=cmd_perf_sweep)

    args = ap.parse_args(argv)
    return args.fn(args) or 0


if __name__ == "__main__":
    sys.exit(main())
