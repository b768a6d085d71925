"""CLI (reference C17: argparse subcommand tree in ``main.py`` — SURVEY.md
§2.1; public API mirrors the reference verbs per BASELINE.json:5: dataset
prep, feature extraction, train, eval, inference).

    python -m mla_tpu prep     --config=... --out=pack.h5 [--tfrecords=glob]
    python -m mla_tpu extract  --wav=a.wav --out=patches.npy
    python -m mla_tpu embed    --wav=a.wav --out=emb.npy
    python -m mla_tpu train    --config=esc50_single_attention [--set k=v ...]
    python -m mla_tpu eval     --config=... [--per_class=out.csv]
    python -m mla_tpu cv       --wav_dir=... --labels_csv=... (k-fold protocol)
    python -m mla_tpu infer    --config=... --wav=a.wav [--stream]
    python -m mla_tpu export   --config=... --out=model.mlax (AOT StableHLO)
    python -m mla_tpu serve    --config=... --port=8000 (HTTP streaming service)
    python -m mla_tpu tag      --url=http://host:8000 --wav=a.wav (client SDK)
    python -m mla_tpu profile  --config=... --out=/tmp/trace (profiler trace)
    python -m mla_tpu parity   (reference-parity harness, T12)
    python -m mla_tpu doctor   (environment self-check; exit 0/1/2)
    python -m mla_tpu configs

(single-chip throughput benchmarks live at the repo root: bench.py,
bench_frontend.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _jdump(obj) -> str:
    """Strict-JSON dumps: non-finite floats (e.g. d' = inf at AUC 1.0)
    become strings so downstream parsers don't choke on 'Infinity'."""

    def clean(v):
        if isinstance(v, float) and not np.isfinite(v):
            return str(v)
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [clean(x) for x in v]
        return v

    return json.dumps(clean(obj))


def _parse_sets(pairs):
    out = {}
    for p in pairs or []:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def _load_cfg(args):
    from mla_tpu.config import get_config

    return get_config(args.config, _parse_sets(getattr(args, "set", None)))


def cmd_configs(_args):
    from mla_tpu.config import list_configs

    print("\n".join(list_configs()))


def cmd_summary(args):
    """Per-module parameter table (the reference family's Keras
    ``model.summary()`` role) — shapes from jax.eval_shape, no device or
    weight materialization needed."""
    import jax

    from mla_tpu.models.zoo import build_model, example_input
    from mla_tpu.train.state import create_train_state

    cfg = _load_cfg(args)
    model = build_model(cfg.model)
    st = jax.eval_shape(lambda: create_train_state(cfg, model, example_input(cfg.model)))

    rows = []  # (path, shape, count) per leaf, grouped by top-level module
    flat = jax.tree_util.tree_flatten_with_path(dict(st.params))[0]
    for path, leaf in flat:
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        rows.append((name, tuple(leaf.shape), int(np.prod(leaf.shape) or 1)))
    width = max(len(r[0]) for r in rows)
    groups = {}
    for name, shape, count in rows:
        print(f"{name:<{width}}  {str(shape):<20} {count:>12,}")
        groups[name.split("/")[0]] = groups.get(name.split("/")[0], 0) + count
    total = sum(c for _, _, c in rows)
    print("-" * (width + 35))
    for g, c in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"{g:<{width}}  {'':<20} {c:>12,}  ({100*c/total:.1f}%)")
    bn = sum(int(np.prod(l.shape) or 1)
             for _, l in jax.tree_util.tree_flatten_with_path(dict(st.batch_stats))[0])
    print(f"{'TOTAL params':<{width}}  {'':<20} {total:>12,}")
    if bn:
        print(f"{'batch_stats (non-trainable)':<{width}}  {'':<20} {bn:>12,}")
    print(f"~{(total + bn) * 4 / 1e6:.1f} MB f32; variant={cfg.model.variant} "
          f"trunk={cfg.model.trunk} classes={cfg.model.n_classes}")


def cmd_prep(args):
    """Build the configured (synthetic) dataset and pack it to HDF5 (C1+C2),
    pack real AudioSet TFRecords with --tfrecords=<glob>, or a local wav
    corpus (ESC-50 / US8K style) with --wav_dir [--labels_csv]."""
    cfg = _load_cfg(args)
    if args.wav_dir:
        from mla_tpu.data.folder import pack_folder

        folds = ([int(f) for f in args.folds.split(",")] if args.folds else None)
        n, classes = pack_folder(
            args.wav_dir, args.out, cfg.data.clip_seconds,
            cfg.frontend.sample_rate, labels_csv=args.labels_csv,
            n_classes=cfg.model.n_classes, folds=folds,
        )
        print(f"packed {n} clips / {len(classes)} classes -> {args.out}")
        return
    if args.tfrecords:
        from mla_tpu.data.audioset import pack_audioset

        n = pack_audioset(args.tfrecords, args.out, cfg.model.n_classes)
        print(f"packed {n} AudioSet clips -> {args.out}")
        return
    from mla_tpu.data import hdf5, synthetic

    kind = "features" if cfg.model.trunk == "none" else "waveform"
    ds = synthetic.make_dataset(cfg.data, cfg.model.n_classes, args.split, cfg.frontend, kind)
    hdf5.pack_hdf5(args.out, ds.x, ds.y.astype(bool), ds.ids, quantize=args.quantize)
    print(f"packed {len(ds.x)} clips ({ds.kind}) -> {args.out}")


def cmd_extract(args):
    """Waveform file -> log-mel patches (C3; reference feature extraction)."""
    cfg = _load_cfg(args)
    import jax.numpy as jnp

    from mla_tpu.data import audio_io
    from mla_tpu.ops import frontend

    wav = audio_io.load_wav_16k(args.wav, cfg.frontend.sample_rate)
    patches = np.asarray(frontend.waveform_to_patches(jnp.asarray(wav), cfg.frontend))
    np.save(args.out, patches)
    print(f"{args.wav}: {len(wav)} samples -> patches {patches.shape} -> {args.out}")


def cmd_train(args):
    # multi-host: the SAME command on every host joins one training run
    # (env-driven JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID,
    # or Cloud-TPU auto-detection); single-process this is a no-op
    from mla_tpu.parallel.distributed import initialize

    initialize()
    cfg = _load_cfg(args)
    from mla_tpu.train.loop import fit

    result = fit(cfg, workspace=args.workspace, auto_resume=args.resume)
    last_eval = result.eval_stats[-1] if result.eval_stats else {}
    print(_jdump({"final_loss": result.history[-1]["loss"] if result.history else None,
                      **{k: v for k, v in last_eval.items()},
                      **({"interrupted": True} if result.interrupted else {})}))


def cmd_eval(args):
    """calculate_stats on the eval set from the latest checkpoint (C13+C15)."""
    cfg = _load_cfg(args)
    from mla_tpu.data.synthetic import make_dataset
    from mla_tpu.models.zoo import build_model
    from mla_tpu.parallel import mesh as pmesh
    from mla_tpu.train.loop import evaluate, resume
    from mla_tpu.train.state import make_eval_step

    state, _ = resume(cfg, args.workspace)
    kind = "features" if cfg.model.trunk == "none" else "waveform"
    eval_ds = make_dataset(cfg.data, cfg.model.n_classes, "eval", cfg.frontend, kind)
    mesh = pmesh.make_mesh(cfg.train.data_parallel, cfg.train.model_parallel)
    model = build_model(cfg.model)
    import jax

    eval_step = jax.jit(make_eval_step(cfg, model, kind))
    stats = evaluate(cfg, model, state, eval_ds, eval_step, mesh)
    if args.per_class or args.calibrate:
        from mla_tpu.data.labels import labels_for
        from mla_tpu.data.sampler import SequentialSampler
        from mla_tpu.parallel import mesh as pmesh

        outs = []
        bs = cfg.train.batch_size
        for idx in SequentialSampler(len(eval_ds.x), bs):
            x = eval_ds.x[idx]
            if len(idx) < bs:
                x = np.concatenate([x, np.repeat(x[-1:], bs - len(idx), 0)])
            outs.append(np.asarray(eval_step(state, pmesh.shard_batch(x, mesh)))[: len(idx)])
        scores = np.concatenate(outs)
        names = labels_for(cfg.data.dataset, cfg.model.n_classes)
        if args.per_class:
            from mla_tpu.utils.metrics import write_per_class_csv

            write_per_class_csv(args.per_class, scores, eval_ds.y, names)
        if args.calibrate:
            # per-class decision thresholds at a precision target (maximal
            # recall) — the operating point infer --events / detect_events
            # consume via --thresholds
            from mla_tpu.utils.metrics import calibrate_thresholds

            thr = calibrate_thresholds(scores, eval_ds.y,
                                       args.target_precision)
            with open(args.calibrate, "w") as fh:
                # full precision: rounding could move a threshold across
                # the exact score boundary the calibrator placed it between
                json.dump({"target_precision": args.target_precision,
                           "thresholds": {n: float(t)
                                          for n, t in zip(names, thr)}},
                          fh, indent=1)
            print(f"# thresholds: {len(thr)} classes at precision>="
                  f"{args.target_precision} -> {args.calibrate}",
                  file=sys.stderr)
    if args.events:
        # score the SED surface end-to-end (VERDICT r3 item 2): the
        # timeline -> detect_events chain against known event boundaries,
        # DCASE segment-based convention
        from mla_tpu.data.labels import labels_for
        from mla_tpu.train.sed_eval import evaluate_sed
        from mla_tpu.train.state import eval_params, variables_from_state

        threshold = _resolve_threshold(
            args, labels_for(cfg.data.dataset, cfg.model.n_classes))

        variables = variables_from_state(state, eval_params(cfg, state))
        stats["events"] = evaluate_sed(
            cfg, variables,
            n_clips=args.sed_clips, threshold=threshold,
            merge_gap_s=args.event_gap, min_dur_s=args.event_min_dur,
            segment_s=args.segment_s)
        if args.sweep:
            # segment-F1-optimal scalar threshold (the clip-level
            # calibrator is documented as not segment-optimal): one device
            # pass, every candidate scored on host
            from mla_tpu.train.sed_eval import sweep_sed_threshold

            grid = (np.array([float(v) for v in args.sweep.split(",")])
                    if args.sweep != "default" else None)
            stats["events_sweep"] = sweep_sed_threshold(
                cfg, variables, thresholds=grid, n_clips=args.sed_clips,
                merge_gap_s=args.event_gap, min_dur_s=args.event_min_dur,
                segment_s=args.segment_s)
    print(_jdump(stats))


def cmd_embed(args):
    """Extract segment embeddings (the VGGish-embedding service use-case):
    wav -> [T, embed_dim] .npy via the configured trunk."""
    cfg = _load_cfg(args)
    import jax.numpy as jnp

    from mla_tpu.data import audio_io
    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops import frontend as fe

    wav = audio_io.load_wav_16k(args.wav, cfg.frontend.sample_rate)
    patches = fe.apply_frontend(jnp.asarray(wav)[None], cfg.frontend)
    model = build_model(cfg.model)
    variables = _load_variables(args, cfg)
    emb = model.apply(variables, patches, method="embed")[0]
    emb = np.asarray(emb.astype("float32"))  # bf16 isn't a numpy dtype
    np.save(args.out, emb)
    print(f"{args.wav}: embeddings {emb.shape} -> {args.out}")


def cmd_infer(args):
    cfg = _load_cfg(args)
    from mla_tpu.data import audio_io
    from mla_tpu.serve.streaming import StreamingTagger, tag_clip

    variables = _load_variables(args, cfg)
    want_tl = bool(getattr(args, "timeline", None) or
                   getattr(args, "events", None) or
                   getattr(args, "plot", None))
    if args.wav_dir:
        if args.wav:
            raise SystemExit("infer: pass one of --wav / --wav_dir")
        if getattr(args, "plot", None):
            raise SystemExit("infer: --plot is single-clip (--wav); batch "
                             "mode writes --timeline CSVs to plot from")
        _infer_dir(args, cfg, variables)
        return
    if not args.wav:
        raise SystemExit("infer: one of --wav / --wav_dir is required")
    from mla_tpu.ops.frontend import patch_hop_seconds

    wav = audio_io.load_wav_16k(args.wav, cfg.frontend.sample_rate)
    hop_s = patch_hop_seconds(cfg.frontend)
    start_patch = 0
    if args.stream:
        # --stream exists for O(1)-memory long-form audio, so the timeline
        # comes from the tagger's on-device ring (last --timeline_cap
        # patches), NOT a whole-clip one-shot forward
        tagger = StreamingTagger(
            cfg, variables,
            timeline_cap=args.timeline_cap if want_tl else 0)
        block = cfg.frontend.sample_rate  # feed 1 s at a time
        for s in range(0, len(wav), block):
            tagger.feed(wav[s : s + block])
        tagger.flush()
        scores = tagger.scores()
        if want_tl:
            start_patch, levels = tagger.timeline()
            w = np.mean([wl for wl, _ in levels], axis=0)
            f = np.mean([fl for _, fl in levels], axis=0)
    else:
        scores = tag_clip(cfg, variables, wav)
        if want_tl:
            w, f = _timeline_mean(cfg, variables, wav)
    from mla_tpu.data.labels import labels_for

    names = labels_for(cfg.data.dataset, cfg.model.n_classes, args.labels_csv)
    top = np.argsort(-scores)[: args.top_k]
    if want_tl:
        if args.timeline:
            _write_timeline_csv(args.timeline, start_patch, hop_s,
                                [names[i] for i in top],
                                f[:, top], w[:, top])
        if args.events:
            _write_events(w, f, hop_s, start_patch, top, names, args)
        if args.plot:
            from mla_tpu.utils import plot as uplot

            mel = mel_hop = None
            if not args.stream:
                # one-shot path: the clip's patches tile the log-mel
                # spectrogram exactly (VGGish non-overlap default)
                from mla_tpu.ops.frontend import waveform_to_patches

                patches = np.asarray(
                    waveform_to_patches(wav[None], cfg.frontend)[0])
                mel = uplot.continuous_mel(patches, cfg.frontend)
                mel_hop = cfg.frontend.stft_hop_seconds
            uplot.plot_timeline(
                args.plot, hop_s, [names[i] for i in top],
                f[:, top], w[:, top], start_patch=start_patch,
                mel=mel, mel_hop_s=mel_hop,
                title=os.path.basename(args.wav))
    print(_jdump({"top_k": [[names[i], float(scores[i])] for i in top]}))


def _infer_dir(args, cfg, variables):
    """Batch-tag every wav under --wav_dir (recursive), one JSONL line per
    clip on stdout (reference C15's "forward the eval set" usage as a
    product verb). Clips of ANY length share one compiled program: each
    clip streams through a single reset() StreamingTagger — a one-shot
    batch would compile a fresh XLA program per distinct clip length.

    Composes with the localization surface (VERDICT r3 item 4):
    ``--events JSON`` inlines each clip's discrete events into its JSONL
    line and (unless the path is ``-``) writes one combined
    ``{relpath: events}`` artifact; ``--timeline DIR`` writes one
    per-patch CSV per clip under DIR (mirroring the corpus layout). Both
    read the tagger's on-device ring, so clips longer than
    ``--timeline_cap`` patches report their LAST cap patches — same ring
    semantics as ``infer --stream --timeline``."""
    import glob as _glob

    from mla_tpu.data import audio_io
    from mla_tpu.data.labels import labels_for
    from mla_tpu.serve.streaming import StreamingTagger

    want_tl = bool(args.timeline or args.events)
    paths = sorted(
        _glob.glob(os.path.join(args.wav_dir, "**", "*.wav"), recursive=True))
    if not paths:
        raise SystemExit(f"infer: no .wav files under {args.wav_dir}")
    names = labels_for(cfg.data.dataset, cfg.model.n_classes, args.labels_csv)
    threshold = _resolve_threshold(args, names) if args.events else None
    from mla_tpu.ops.frontend import patch_hop_seconds

    if args.timeline:
        os.makedirs(args.timeline, exist_ok=True)
    hop_s = patch_hop_seconds(cfg.frontend)
    tagger = StreamingTagger(
        cfg, variables, timeline_cap=args.timeline_cap if want_tl else 0)
    block = 10 * cfg.frontend.sample_rate
    all_events = {}
    for path in paths:
        wav = audio_io.load_wav_16k(path, cfg.frontend.sample_rate)
        tagger.reset()
        for s in range(0, len(wav), block):
            tagger.feed(wav[s: s + block])
        tagger.flush()
        scores = tagger.scores()
        top = np.argsort(-scores)[: args.top_k]
        line = {
            "wav": path,
            "seconds": round(len(wav) / cfg.frontend.sample_rate, 3),
            "top_k": [[names[i], float(scores[i])] for i in top],
        }
        if want_tl:
            from mla_tpu.serve.events import detect_events

            start_patch, levels = tagger.timeline()
            w = np.mean([wl for wl, _ in levels], axis=0)
            f = np.mean([fl for _, fl in levels], axis=0)
            rel = os.path.relpath(path, args.wav_dir)
            if args.timeline:
                out_csv = os.path.join(
                    args.timeline, os.path.splitext(rel)[0] + ".timeline.csv")
                os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
                _write_timeline_csv(out_csv, start_patch, hop_s,
                                    [names[i] for i in top],
                                    f[:, top], w[:, top])
            if args.events:
                events = detect_events(
                    f, w, hop_s=hop_s, start_patch=start_patch,
                    threshold=threshold,
                    merge_gap_s=args.event_gap,
                    min_dur_s=args.event_min_dur,
                    class_names=names, classes=[int(i) for i in top])
                line["events"] = events
                all_events[rel] = events
        print(_jdump(line))
    if args.events and args.events != "-":
        with open(args.events, "w") as fh:
            json.dump({"hop_s": hop_s,
                       "threshold": _threshold_desc(args),
                       "clips": all_events}, fh, indent=1)
        print(f"# events: {sum(len(v) for v in all_events.values())} over "
              f"{len(all_events)} clips -> {args.events}", file=sys.stderr)


def _timeline_mean(cfg, variables, wav):
    """One-shot level-mean localization readout: (weights [T, C],
    probs [T, C]) via model.timeline over the whole clip."""
    import jax.numpy as jnp

    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops import frontend as fe

    model = build_model(cfg.model)
    patches = fe.apply_frontend(jnp.asarray(wav)[None], cfg.frontend)
    tl = model.apply(variables, patches, method="timeline")
    w = np.mean([np.asarray(wl, np.float32)[0] for wl, _ in tl], axis=0)
    f = np.mean([np.asarray(fl, np.float32)[0] for _, fl in tl], axis=0)
    return w, f


def _write_timeline_csv(path, start_patch, hop_s, col_names, probs, atts):
    """THE per-patch localization CSV writer (infer --timeline and
    tag --timeline share it so the format cannot fork): one row per
    0.96 s patch with ABSOLUTE patch indices/times, columns prob:<label>
    (segment classifier) and att:<label> (time-normalized attention
    weight; uniform = 1/n_patches) per selected class, level-averaged.
    probs/atts: [T, k] arrays, columns ordered like col_names."""
    probs = np.asarray(probs, np.float32)
    atts = np.asarray(atts, np.float32)
    with open(path, "w") as fh:
        cols = ",".join(f"prob:{n},att:{n}" for n in col_names)
        fh.write(f"patch,time_s,{cols}\n")
        for t in range(probs.shape[0]):
            patch = start_patch + t
            vals = ",".join(f"{probs[t, j]:.6f},{atts[t, j]:.6f}"
                            for j in range(probs.shape[1]))
            fh.write(f"{patch},{patch * hop_s:.3f},{vals}\n")
    print(f"# timeline: {probs.shape[0]} patches x top-{len(col_names)} "
          f"classes -> {path}", file=sys.stderr)


def _threshold_desc(args):
    """The operating point recorded in event artifacts: the scalar
    --event_threshold, or the provenance of a per-class --thresholds
    table (ONE definition — infer, --wav_dir, and tag must agree on how
    they describe their own output)."""
    t = getattr(args, "thresholds", None)
    return f"per-class ({t})" if t else args.event_threshold


def _resolve_threshold(args, names):
    """The event operating point: the scalar --event_threshold, or the
    per-class table from ``eval --calibrate`` via --thresholds (one
    resolver for the single-clip, --wav_dir, and eval --events paths)."""
    if not getattr(args, "thresholds", None):
        return args.event_threshold
    with open(args.thresholds) as fh:
        table = json.load(fh)["thresholds"]
    missing = [n for n in names if n not in table]
    if missing:
        raise SystemExit(
            f"--thresholds file lacks {len(missing)} of this "
            f"config's classes (e.g. {missing[:3]}) — calibrate with "
            "the same config/labels")
    return np.asarray([table[n] for n in names], np.float32)


def _write_events(w, f, hop_s, start_patch, top, names, args):
    """Discrete event list (serve/events.py over the clip's top-k classes)
    as one JSON file: threshold / gap-merge / min-duration via
    --event_threshold / --event_gap / --event_min_dur, or per-class
    calibrated thresholds from ``eval --calibrate`` via --thresholds."""
    from mla_tpu.serve.events import detect_events

    threshold = _resolve_threshold(args, names)
    events = detect_events(
        f, w, hop_s=hop_s, start_patch=start_patch,
        threshold=threshold,
        merge_gap_s=args.event_gap, min_dur_s=args.event_min_dur,
        class_names=names, classes=[int(i) for i in top])
    with open(args.events, "w") as fh:
        json.dump({"hop_s": hop_s,
                   "threshold": _threshold_desc(args),
                   "events": events}, fh, indent=1)
    print(f"# events: {len(events)} -> {args.events}", file=sys.stderr)


def _load_variables(args, cfg, sample_wav_seconds: float = 2.0):
    """Checkpoint variables per --checkpoint/--workspace, or random demo
    weights (shared by embed/infer/export)."""
    import jax
    import jax.numpy as jnp

    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops import frontend as fe

    if getattr(args, "checkpoint", "latest") != "random":
        try:
            from mla_tpu.train.loop import resume
            from mla_tpu.train.state import eval_params, variables_from_state

            state, _ = resume(cfg, args.workspace)
            return variables_from_state(state, eval_params(cfg, state))
        except FileNotFoundError:
            print("# no checkpoint found — using random weights (demo mode)",
                  file=sys.stderr)
    model = build_model(cfg.model)
    n = int(sample_wav_seconds * cfg.frontend.sample_rate)
    patches = fe.apply_frontend(jnp.zeros((1, n), jnp.float32), cfg.frontend)
    return model.init(jax.random.key(0), patches)


def cmd_weights(args):
    """Bare-weight interchange (the reference's .h5/.pth weight-file role):
    --out dumps the latest checkpoint's params as a flat .npz
    ('block0/fc0/kernel'-style keys); --load imports such an .npz into a
    fresh step-0 checkpoint that eval/infer/train --resume can use."""
    cfg = _load_cfg(args)
    import jax
    import jax.numpy as jnp

    from mla_tpu.models.convert import flat_to_params, params_to_flat
    from mla_tpu.models.zoo import build_model, example_input
    from mla_tpu.train.checkpoint import CheckpointManager
    from mla_tpu.train.state import create_train_state

    workspace = args.workspace or cfg.workspace
    ckpt_dir = os.path.join(workspace, "checkpoints", cfg.name)
    if args.out:
        from mla_tpu.train.loop import resume
        from mla_tpu.train.state import eval_params

        state, _ = resume(cfg, workspace)
        # params AND batch_stats: BatchNorm running averages are part of the
        # model function in eval mode — weights alone predict garbage.
        # --ema dumps the Polyak shadow (the serving tree when
        # train.ema_decay > 0) instead of the online params.
        p = state.params
        if getattr(args, "ema", False):
            if state.ema_params is None:
                raise SystemExit("checkpoint has no EMA shadow "
                                 "(trained with train.ema_decay=0)")
            p = state.ema_params
        flat = params_to_flat(jax.tree.map(np.asarray, dict(p)),
                              prefix="params/")
        if state.batch_stats:
            flat.update(params_to_flat(
                jax.tree.map(np.asarray, dict(state.batch_stats)),
                prefix="batch_stats/",
            ))
        np.savez_compressed(args.out, **flat)
        print(f"{len(flat)} weight arrays -> {args.out}")
        return
    if args.load:
        flat = dict(np.load(args.load))
        model = build_model(cfg.model)
        state = create_train_state(cfg, model, example_input(cfg.model))
        # template-validate: the imported keys/shapes must match the config
        tmpl = params_to_flat(jax.tree.map(np.asarray, dict(state.params)),
                              prefix="params/")
        if state.batch_stats:
            tmpl.update(params_to_flat(
                jax.tree.map(np.asarray, dict(state.batch_stats)),
                prefix="batch_stats/",
            ))
        missing = sorted(set(tmpl) - set(flat))
        extra = sorted(set(flat) - set(tmpl))
        if (missing or extra) and not args.allow_partial:
            raise SystemExit(f"weight-key mismatch: missing {missing[:4]}, "
                             f"unexpected {extra[:4]} "
                             "(--allow_partial warm-starts the intersection)")
        # --allow_partial: transfer learning — matched keys (e.g. a
        # pretrained trunk) are imported, everything else keeps its fresh
        # init (e.g. new heads for a different class count)
        used = {k: flat[k] for k in tmpl if k in flat}
        mismatched = {k for k, v in used.items() if np.shape(v) != np.shape(tmpl[k])}
        if mismatched and not args.allow_partial:
            k = sorted(mismatched)[0]
            raise SystemExit(
                f"{k}: shape {np.shape(used[k])} != expected {np.shape(tmpl[k])}"
            )
        used = {k: v for k, v in used.items() if k not in mismatched}
        merged = dict(tmpl)
        merged.update(used)
        tree = flat_to_params(merged)
        imported = jax.tree.map(jnp.asarray, tree["params"])
        state = state.replace(
            params=imported,
            batch_stats=jax.tree.map(jnp.asarray, tree.get("batch_stats", {})),
            # seed the Polyak shadow from the IMPORTED weights — leaving it
            # at the fresh random init would make EMA-enabled eval/serving
            # silently predict from noise until the average washes out
            ema_params=(jax.tree.map(jnp.asarray, imported)
                        if state.ema_params is not None else None),
        )
        mgr = CheckpointManager(ckpt_dir, async_save=False)
        mgr.save(0, state, sampler_state={"imported_from": os.path.basename(args.load),
                                          "step": 0})
        mgr.wait()
        mgr.close()
        print(f"imported {len(used)}/{len(tmpl)} arrays -> checkpoint step 0 "
              f"in {ckpt_dir}")
        return
    raise SystemExit("weights: pass --out=<npz> or --load=<npz>")


def cmd_profile(args):
    """Capture a jax.profiler trace of the configured train step (SURVEY.md
    §5 tracing row): compile once, run --steps steps inside one trace
    (TensorBoard/Perfetto-compatible), report axon-aware wall timings +
    device memory stats as one JSON line."""
    cfg = _load_cfg(args)
    import time as _time

    import jax
    import jax.numpy as jnp

    from mla_tpu.data.synthetic import make_dataset
    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops.frontend import waveform_to_patches
    from mla_tpu.train.state import create_train_state, make_train_step
    from mla_tpu.utils import profiling

    kind = "features" if cfg.model.trunk == "none" else "waveform"
    ds = make_dataset(cfg.data, cfg.model.n_classes, "train", cfg.frontend, kind)
    bs = min(args.batch or cfg.train.batch_size, len(ds.x))
    x = jnp.asarray(ds.x[:bs])
    y = jnp.asarray(ds.y[:bs], jnp.float32)
    model = build_model(cfg.model)
    sample = waveform_to_patches(x, cfg.frontend) if kind == "waveform" else x
    state = create_train_state(cfg, model, sample)
    step = jax.jit(make_train_step(cfg, model, kind), donate_argnums=(0,))
    state, loss = step(state, x, y)
    np.asarray(loss)  # compile + sync OUTSIDE the trace
    with profiling.trace(args.out) as trace_dir:
        t0 = _time.perf_counter()
        for _ in range(args.steps):
            state, loss = step(state, x, y)
        np.asarray(loss)  # host fetch = the only real barrier on axon
        dt = _time.perf_counter() - t0
    print(_jdump({
        "trace_dir": trace_dir,
        "steps": args.steps,
        "batch": bs,
        "mean_step_ms": round(dt / args.steps * 1e3, 3),
        "clips_per_sec": round(bs * args.steps / dt, 1),
        "memory": {k: v for k, v in profiling.memory_stats().items()
                   if "bytes" in k},
    }))


def cmd_serve(args):
    """Run the HTTP streaming-inference service (T11 as a deployable
    endpoint: open/feed/scores/flush/close per stream, one batched device
    program per tick across all open streams)."""
    cfg = _load_cfg(args)
    from mla_tpu.serve.http import create_server

    # snapshot the step BEFORE loading: if a newer checkpoint lands in the
    # load->watcher window the watcher does one redundant (harmless)
    # reload, instead of silently skipping a step written during warmup
    ckdir = os.path.join(args.workspace or cfg.workspace,
                         "checkpoints", cfg.name)
    try:
        loaded_step = max((int(d) for d in os.listdir(ckdir) if d.isdigit()),
                          default=None)
    except OSError:
        loaded_step = None
    variables = _load_variables(args, cfg)
    mesh = None
    if args.shard_streams:
        from mla_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh()

    _reload_cache = {}

    def reload_fn():
        # POST /v1/reload + the --reload_every watcher: re-read the
        # workspace's LATEST checkpoint. Deliberately lighter than
        # _load_variables: the abstract-state sample is computed once and
        # cached (resume() would otherwise rebuild the training dataset on
        # every reload just to learn a shape — a stall on this 1-core
        # host), and a missing checkpoint is an error rather than a silent
        # fall-back to random weights mid-service.
        from mla_tpu.train.loop import resume, resume_sample
        from mla_tpu.train.state import eval_params, variables_from_state

        if "sample" not in _reload_cache:
            _reload_cache["sample"] = resume_sample(cfg)
        state, _ = resume(cfg, args.workspace,
                          sample=_reload_cache["sample"])
        variables = variables_from_state(state, eval_params(cfg, state))
        return variables, {"step": int(state.step)}

    if args.native:
        from mla_tpu.serve.native_front import create_native_server

        srv = create_native_server(
            cfg, variables, port=args.port, host=args.host,
            max_streams=args.max_streams, chunk_patches=args.chunk_patches,
            transfer_dtype=args.transfer_dtype, mesh=mesh,
            timeline_cap=args.timeline_cap, reload_fn=reload_fn)
    else:
        srv = create_server(cfg, variables, port=args.port, host=args.host,
                            max_streams=args.max_streams,
                            chunk_patches=args.chunk_patches,
                            transfer_dtype=args.transfer_dtype, mesh=mesh,
                            timeline_cap=args.timeline_cap,
                            reload_fn=reload_fn)
    if args.reload_every > 0:
        from mla_tpu.serve.http import start_reload_watcher

        # loaded_step was captured BEFORE server construction/warmup: a
        # checkpoint that lands during the (minutes-long) warmup window
        # must still trigger a reload
        start_reload_watcher(srv, ckdir, args.reload_every,
                             initial_step=loaded_step)
    host, port = srv.server_address[:2]
    sharded = f", streams sharded over {mesh.shape}" if mesh is not None else ""
    front = "native C++ front" if args.native else "stdlib front"
    print(f"serving {cfg.model.variant} on http://{host}:{port}/v1 "
          f"({front}, max_streams={args.max_streams}{sharded})", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


def cmd_doctor(args):
    """Environment self-check (SURVEY.md §5 observability row; no reference
    analogue — its single-host script assumes a healthy machine). Prints one
    JSON report; exit 0 = ok, 1 = degraded, 2 = no device. Encodes this
    platform's measured failure modes (hung tunnel, no-op block_until_ready,
    ~27 ms fetch RTT, bf16 default matmuls, non-exclusive chip)."""
    import jax

    from mla_tpu.utils import doctor

    if args.platform:
        # must land before the first backend touch; the env-var route is
        # closed here (sitecustomize pins JAX_PLATFORMS at interpreter
        # start — CLAUDE.md environment notes)
        jax.config.update("jax_platforms", args.platform)
    report = doctor.run(device_timeout_s=args.device_timeout,
                        quick=args.quick)
    print(_jdump(report))
    status = report["verdict"]["status"]
    return {"ok": 0, "degraded": 1, "no-device": 2}[status]


def cmd_cv(args):
    """k-fold cross-validation: pack each fold rotation once, train fit()
    per held-out fold, print mean±std of the final eval metrics (the
    reference family's actual ESC-50/US8K evaluation protocol)."""
    cfg = _load_cfg(args)
    from mla_tpu.train.cv import cross_validate

    folds = [int(f) for f in args.folds.split(",")] if args.folds else None
    out = cross_validate(cfg, args.wav_dir, args.labels_csv,
                         workspace=args.workspace or cfg.workspace,
                         folds=folds, log=not args.quiet)
    print(_jdump(out))


def cmd_export(args):
    """Serialize the compiled waveform->probs forward (weights baked) to a
    portable StableHLO artifact (deployment tier of C15/T11)."""
    cfg = _load_cfg(args)
    from mla_tpu.serve.export import export_forward

    variables = _load_variables(args, cfg)
    if args.streaming:
        from mla_tpu.serve.export import export_streaming

        meta = export_streaming(cfg, variables, args.out,
                                streams=args.batch,
                                chunk_patches=args.chunk_patches,
                                input_dtype=args.input_dtype,
                                timeline_cap=args.timeline_cap)
    else:
        meta = export_forward(cfg, variables, args.out, batch=args.batch,
                              seconds=args.seconds,
                              input_dtype=args.input_dtype)
    print(_jdump({"out": args.out, **meta}))


def cmd_tag(args):
    """Client side of ``serve``: tag a wav through a RUNNING service,
    uploading in the chosen wire encoding (serve/client.py). With
    ``--timeline CSV`` / ``--events JSON`` the clip goes through the
    stream API instead of /v1/tag so the per-patch localization window
    can be fetched after the flush (requires the service to run with
    --timeline_cap > 0); events are detected CLIENT-side from that
    window (serve/events.py)."""
    from mla_tpu.serve.client import TagClient

    c = TagClient(args.url)
    if getattr(args, "timeline", None) or getattr(args, "events", None):
        from mla_tpu.data import audio_io

        sr = int(c.health().get("sample_rate", 16000))
        wav = audio_io.load_wav_16k(args.wav, sr)
        wire = "int16" if args.wire == "wav" else args.wire
        with c.stream(wire=wire) as s:
            s.feed(wav)
            s.flush()
            top = s.scores(top_k=args.top_k)
            tl = s.timeline(top_k=args.top_k)
        if args.timeline:
            _write_timeline_csv(args.timeline, tl["start_patch"],
                                tl["hop_s"],
                                [n for n, _ in tl["classes"]],
                                tl["probs"], tl["weights"])
        if args.events:
            from mla_tpu.serve.events import events_from_timeline_payload

            threshold = args.event_threshold
            if getattr(args, "thresholds", None):
                with open(args.thresholds) as fh:
                    threshold = json.load(fh)["thresholds"]
            events = events_from_timeline_payload(
                tl, threshold=threshold,
                merge_gap_s=args.event_gap, min_dur_s=args.event_min_dur)
            with open(args.events, "w") as fh:
                json.dump({"hop_s": tl["hop_s"],
                           "threshold": _threshold_desc(args),
                           "events": events}, fh, indent=1)
            print(f"# events: {len(events)} -> {args.events}",
                  file=sys.stderr)
    elif args.wire == "wav":
        top = c.tag_file(args.wav, top_k=args.top_k)
    else:
        from mla_tpu.data import audio_io

        sr = int(c.health().get("sample_rate", 16000))
        wav = audio_io.load_wav_16k(args.wav, sr)
        top = c.tag(wav, top_k=args.top_k, wire=args.wire)
    print(_jdump({"top_k": [[n, float(p)] for n, p in top]}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="mla_tpu", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("configs", help="list named configs").set_defaults(fn=cmd_configs)

    ssum = sub.add_parser("summary", help="per-module parameter table")
    ssum.add_argument("--config", default="audioset_full_dp")
    ssum.add_argument("--set", nargs="*")
    ssum.set_defaults(fn=cmd_summary)

    sp = sub.add_parser("prep", help="build + pack dataset to HDF5")
    sp.add_argument("--config", default="default")
    sp.add_argument("--split", default="train", choices=["train", "eval"])
    sp.add_argument("--out", required=True)
    sp.add_argument("--quantize", action="store_true")
    sp.add_argument("--tfrecords", default=None,
                    help="glob of AudioSet SequenceExample tfrecord shards")
    sp.add_argument("--wav_dir", default=None,
                    help="local wav corpus root (class subdirs or --labels_csv)")
    sp.add_argument("--labels_csv", default=None,
                    help="ESC-50/US8K-style metadata CSV for --wav_dir")
    sp.add_argument("--folds", default=None,
                    help="comma-separated CSV 'fold' values to keep, e.g. "
                         "--folds=1,2,3,4 (train) / --folds=5 (eval) — the "
                         "ESC-50/US8K cross-validation protocol")
    sp.add_argument("--set", nargs="*")
    sp.set_defaults(fn=cmd_prep)

    se = sub.add_parser("extract", help="wav -> log-mel patches .npy")
    se.add_argument("--config", default="default")
    se.add_argument("--wav", required=True)
    se.add_argument("--out", required=True)
    se.add_argument("--set", nargs="*")
    se.set_defaults(fn=cmd_extract)

    st = sub.add_parser("train", help="train per config")
    st.add_argument("--config", default="esc50_single_attention")
    st.add_argument("--workspace", default=None)
    st.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint and continue")
    st.add_argument("--set", nargs="*")
    st.set_defaults(fn=cmd_train)

    sv = sub.add_parser("eval", help="evaluate latest checkpoint")
    sv.add_argument("--config", default="esc50_single_attention")
    sv.add_argument("--workspace", default=None)
    sv.add_argument("--per_class", default=None,
                    help="write per-class AP/AUC/d' CSV to this path")
    sv.add_argument("--calibrate", default=None, metavar="JSON",
                    help="write per-class decision thresholds calibrated "
                         "on the eval set (maximal recall at "
                         "--target_precision); infer --events consumes "
                         "them via --thresholds")
    sv.add_argument("--target_precision", type=float, default=0.8)
    sv.add_argument("--events", action="store_true",
                    help="additionally score the SED surface end-to-end: "
                         "timeline -> detect_events on the synthetic "
                         "event-boundary corpus, DCASE segment-based "
                         "F1/error-rate (train/sed_eval.py)")
    sv.add_argument("--thresholds", default=None, metavar="JSON",
                    help="per-class thresholds for --events (an "
                         "eval --calibrate output); default scalar 0.5")
    sv.add_argument("--event_threshold", type=float, default=0.5)
    sv.add_argument("--event_gap", type=float, default=0.0,
                    help="merge events separated by gaps <= this (s)")
    sv.add_argument("--event_min_dur", type=float, default=0.0,
                    help="drop events shorter than this (s)")
    sv.add_argument("--segment_s", type=float, default=None,
                    help="scoring grid for --events (default: the "
                         "timeline's 0.96 s patch hop; 1.0 = DCASE grid)")
    sv.add_argument("--sed_clips", type=int, default=None,
                    help="event-corpus size for --events "
                         "(default data.n_eval_clips)")
    sv.add_argument("--sweep", nargs="?", const="default", default=None,
                    metavar="T1,T2,...",
                    help="with --events: sweep the scalar event threshold "
                         "and report the segment-F1-optimal operating "
                         "point (default grid 0.05..0.95 step 0.05; the "
                         "timelines are computed once)")
    sv.add_argument("--set", nargs="*")
    sv.set_defaults(fn=cmd_eval)

    se2 = sub.add_parser("embed", help="wav -> segment embeddings .npy")
    se2.add_argument("--config", default="streaming_inference")
    se2.add_argument("--wav", required=True)
    se2.add_argument("--out", required=True)
    se2.add_argument("--workspace", default=None)
    se2.add_argument("--checkpoint", default="latest",
                     help="'latest' or 'random' (demo fallback if no checkpoint)")
    se2.add_argument("--set", nargs="*")
    se2.set_defaults(fn=cmd_embed)

    si = sub.add_parser("infer", help="tag a wav file")
    si.add_argument("--config", default="streaming_inference")
    si.add_argument("--wav", default=None)
    si.add_argument("--wav_dir", default=None,
                    help="batch mode: tag every .wav under this directory "
                         "(recursive), one JSONL line per clip; any clip "
                         "lengths share ONE compiled streaming program")
    si.add_argument("--workspace", default=None)
    si.add_argument("--checkpoint", default="latest",
                    help="'latest' uses the newest checkpoint (random-weight demo "
                         "fallback if none exists); 'random' forces demo weights")
    si.add_argument("--stream", action="store_true", help="chunked streaming path")
    si.add_argument("--top_k", type=int, default=5)
    si.add_argument("--labels_csv", default=None,
                    help="AudioSet class_labels_indices.csv for display names")
    si.add_argument("--timeline", default=None, metavar="CSV",
                    help="also write the per-patch localization readout "
                         "(attention weights + segment probs for the clip's "
                         "top-k classes) — the attention model's native "
                         "event-in-time output")
    si.add_argument("--events", default=None, metavar="JSON",
                    help="also write discrete events (threshold + gap-merge "
                         "+ min-duration over the top-k classes' per-patch "
                         "probs — serve/events.py)")
    si.add_argument("--event_threshold", type=float, default=0.5)
    si.add_argument("--thresholds", default=None, metavar="JSON",
                    help="per-class thresholds from eval --calibrate "
                         "(overrides --event_threshold)")
    si.add_argument("--event_gap", type=float, default=0.0,
                    help="merge events separated by gaps <= this (seconds)")
    si.add_argument("--event_min_dur", type=float, default=0.0,
                    help="drop events shorter than this (seconds)")
    si.add_argument("--timeline_cap", type=int, default=256,
                    help="with --stream: size of the on-device localization "
                         "ring --timeline/--events read (the LAST N patches "
                         "— keeps long-form audio O(1)-memory)")
    si.add_argument("--plot", default=None, metavar="PNG",
                    help="render the timeline as a figure (top-k class "
                         "probability + attention-gate curves over clip "
                         "time, log-mel underlay — the paper's Fig. 2 "
                         "qualitative analysis); single --wav only")
    si.add_argument("--set", nargs="*")
    si.set_defaults(fn=cmd_infer)

    sw = sub.add_parser("weights", help="flat-.npz weight export/import")
    sw.add_argument("--config", default="streaming_inference")
    sw.add_argument("--workspace", default=None)
    sw.add_argument("--out", default=None, help="dump latest checkpoint params to .npz")
    sw.add_argument("--load", default=None, help="import .npz as a step-0 checkpoint")
    sw.add_argument("--ema", action="store_true",
                    help="--out dumps the EMA (Polyak) shadow instead of "
                         "the online params")
    sw.add_argument("--allow_partial", action="store_true",
                    help="warm-start only the matching keys (transfer "
                         "learning: pretrained trunk + fresh heads)")
    sw.add_argument("--set", nargs="*")
    sw.set_defaults(fn=cmd_weights)

    spr = sub.add_parser("profile", help="trace the train step (jax.profiler)")
    spr.add_argument("--config", default="esc50_single_attention")
    spr.add_argument("--out", default="/tmp/mla_tpu_trace")
    spr.add_argument("--steps", type=int, default=10)
    spr.add_argument("--batch", type=int, default=None)
    spr.add_argument("--set", nargs="*")
    spr.set_defaults(fn=cmd_profile)

    ss = sub.add_parser("serve", help="HTTP streaming-inference service")
    ss.add_argument("--config", default="streaming_inference")
    ss.add_argument("--workspace", default=None)
    ss.add_argument("--checkpoint", default="latest")
    ss.add_argument("--host", default="127.0.0.1")
    ss.add_argument("--port", type=int, default=8000)
    ss.add_argument("--max_streams", type=int, default=8)
    ss.add_argument("--chunk_patches", type=int, default=5,
                    help="patches per device tick: the throughput/latency "
                         "dial. Each tick folds chunk_patches*0.96 s per "
                         "stream, so score freshness lags by that much; "
                         "larger values amortize the fixed per-tick "
                         "host+dispatch cost over more audio (40 measured "
                         "+24%% throughput vs 10 on-chip). Raise it for "
                         "offline/bulk feeds, keep small for live audio")
    ss.add_argument("--transfer_dtype", default="int16",
                    choices=["int16", "float32", "uint8", "adpcm4", "adpcm2"],
                    help="wire/device-transfer dtype; int16 halves host->device "
                         "bytes, uint8 (8-bit mu-law) quarters them, adpcm4 "
                         "(4-bit block ADPCM, decoded on device) is ~1/8 of "
                         "f32, adpcm2 ~1/13 (max throughput, ~14 dB SNR)")
    ss.add_argument("--shard_streams", action="store_true",
                    help="shard the per-tick stream axis over all devices "
                         "(T11 at pod scale; max_streams must divide the "
                         "device count)")
    ss.add_argument("--native", action="store_true",
                    help="serve through the C++ ingest front (native/"
                         "serve_front.cpp): HTTP parsing, stream buffers, "
                         "and backpressure run GIL-free; Python only runs "
                         "device ticks and rare control requests")
    ss.add_argument("--timeline_cap", type=int, default=0,
                    help="enable GET /v1/streams/<sid>/timeline: record "
                         "the last N patches' localization readout in an "
                         "on-device ring inside the tick program (0 = off)")
    ss.add_argument("--reload_every", type=float, default=0,
                    help="auto hot-reload: poll the workspace every N "
                         "seconds and swap weights whenever training wrote "
                         "a newer checkpoint (zero downtime; 0 = off). "
                         "POST /v1/reload triggers the same swap on demand")
    ss.add_argument("--set", nargs="*")
    ss.set_defaults(fn=cmd_serve)

    sg = sub.add_parser("tag", help="tag a wav via a running serve endpoint")
    sg.add_argument("--url", default="http://127.0.0.1:8000")
    sg.add_argument("--wav", required=True)
    sg.add_argument("--top_k", type=int, default=5)
    sg.add_argument("--wire", default="adpcm4",
                    choices=["wav", "float32", "int16", "mulaw", "adpcm4",
                             "adpcm2"],
                    help="upload encoding; adpcm4 is ~1/8 of float32 and "
                         "decodes on the serving device")
    sg.add_argument("--timeline", default=None, metavar="CSV",
                    help="also fetch the per-patch localization window "
                         "(server must run with --timeline_cap > 0) and "
                         "write it as CSV, like infer --timeline")
    sg.add_argument("--events", default=None, metavar="JSON",
                    help="also detect discrete events from the timeline "
                         "window (client-side; like infer --events)")
    sg.add_argument("--event_threshold", type=float, default=0.5)
    sg.add_argument("--thresholds", default=None, metavar="JSON",
                    help="per-class thresholds from eval --calibrate "
                         "(overrides --event_threshold)")
    sg.add_argument("--event_gap", type=float, default=0.0)
    sg.add_argument("--event_min_dur", type=float, default=0.0)
    sg.set_defaults(fn=cmd_tag)

    sc = sub.add_parser("cv", help="k-fold cross-validation (ESC-50/US8K protocol)")
    sc.add_argument("--config", default="esc50_single_attention")
    sc.add_argument("--wav_dir", required=True, help="wav corpus root")
    sc.add_argument("--labels_csv", required=True,
                    help="metadata CSV with a 'fold' column")
    sc.add_argument("--workspace", default=None)
    sc.add_argument("--folds", default=None,
                    help="comma-separated held-out folds to run (default: all)")
    sc.add_argument("--quiet", action="store_true")
    sc.add_argument("--set", nargs="*")
    sc.set_defaults(fn=cmd_cv)

    sx = sub.add_parser("export", help="AOT-export waveform->probs to StableHLO")
    sx.add_argument("--config", default="streaming_inference")
    sx.add_argument("--workspace", default=None)
    sx.add_argument("--checkpoint", default="latest")
    sx.add_argument("--out", required=True)
    sx.add_argument("--batch", type=int, default=8,
                    help="clips per call (one-shot) / streams (--streaming)")
    sx.add_argument("--seconds", type=float, default=10.0)
    sx.add_argument("--streaming", action="store_true",
                    help="export the O(1)-state STREAMING tagger instead: "
                         "a chunk-fold + finalize program pair for "
                         "unbounded audio (loop chunks, read scores any "
                         "time; load_exported_streaming)")
    sx.add_argument("--chunk_patches", type=int, default=5,
                    help="patches per chunk call (--streaming)")
    sx.add_argument("--timeline_cap", type=int, default=0,
                    help="with --streaming: bake the localization ring "
                         "into the chunk program (StreamingArtifact."
                         "timeline reads the window at the edge; 0 = off)")
    sx.add_argument("--input_dtype", default="float32",
                    choices=["float32", "int16", "uint8", "adpcm4", "adpcm2"],
                    help="bake the wire format in: int16 PCM / uint8 mu-law /"
                         " adpcm4 wire inputs are decoded inside the compiled"
                         " program")
    sx.add_argument("--set", nargs="*")
    sx.set_defaults(fn=cmd_export)

    sy = sub.add_parser("parity", help="run the reference-parity harness (T12)")
    sy.set_defaults(fn=lambda a: __import__("mla_tpu.parity", fromlist=["main"]).main())

    sd = sub.add_parser("doctor", help="environment self-check (device probe,"
                        " tunnel RTT, compile latency, precision audit,"
                        " exclusive-chip spread)")
    sd.add_argument("--quick", action="store_true",
                    help="skip the GEMM throughput spot check")
    sd.add_argument("--device_timeout", type=float, default=120.0,
                    help="seconds before the jax.devices() probe is declared"
                         " hung (tunnel down)")
    sd.add_argument("--platform", default=None,
                    help="check this JAX platform instead of the configured"
                         " one (e.g. cpu while the TPU tunnel is down)")
    sd.set_defaults(fn=cmd_doctor)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
