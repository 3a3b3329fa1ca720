"""Pipeline presets: the named end-to-end pipelines users run.

The framework's "model zoo" analog: each preset builds the operator DAG for
one of the reference's CLI commands (reference: cmd/nightlight/main.go:
285-405) from a parameter namespace, so library users get complete
pipelines without going through the CLI.
"""

from __future__ import annotations


def build_preprocess_seq(args, op_star_detect, op_debayer):
    """The shared preprocessing sub-DAG (main.go:285-297)."""
    from nightlight_tpu.pipeline import OpSave, OpSequence
    from nightlight_tpu.pipeline.operators import ExportMode
    from nightlight_tpu.pipeline.ops_pre import (
        OpBackExtract, OpBadPixel, OpBin, OpCalibrate, OpDebandHoriz,
        OpDebandVert, OpScaleOffset,
    )
    from nightlight_tpu.pipeline.ops_ref import OpExportStats

    return OpSequence(steps=[
        OpCalibrate(dark=args.dark, flat=args.flat),
        OpBadPixel(sigma_low=args.bpSigLow, sigma_high=args.bpSigHigh, debayer=op_debayer),
        op_debayer,
        OpDebandHoriz(percentile=args.debandH, window=args.debandHWindow, sigma=args.debandHSigma),
        OpDebandVert(percentile=args.debandV, window=args.debandVWindow, sigma=args.debandVSigma),
        OpScaleOffset(scale=args.preScale, offset=args.preOffset),
        OpBin(bin_size=args.binning),
        op_star_detect,
        OpBackExtract(grid_size=args.backGrid, hfr_factor=args.backHFRFactor,
                      sigma=args.backSigma, clip=args.backClip,
                      save=OpSave(file_pattern=args.back, export_mode=int(ExportMode.MinMax), gamma=1)),
        OpExportStats(file_name=args.exportStats),
        OpSave(file_pattern=args.pre, export_mode=int(ExportMode.MinMax), gamma=1),
    ])


def build_command_seq(args):
    """Build the preset DAG for the current command (main.go:300-405)."""
    from nightlight_tpu.pipeline import OpLoadMany, OpSave, OpSequence
    from nightlight_tpu.pipeline.operators import ExportMode
    from nightlight_tpu.pipeline.ops_pre import OpDebayer, OpStarDetect
    from nightlight_tpu.pipeline.ops_ref import OpFilter, OpSelectReference, SelRefTarget
    from nightlight_tpu.pipeline.ops_post import OpAlign, OpMatchHistogram, OutOfBoundsMode
    from nightlight_tpu.pipeline.ops_stack import OpStack, OpStackBatches
    from nightlight_tpu.pipeline.ops_rgb import (
        OpHSLuvToRGB, OpRGBBalance, OpRGBCombine, OpRGBToHSLuv,
    )
    from nightlight_tpu.pipeline.ops_hsl import (
        OpHSLApplyLum, OpHSLGamma, OpHSLGammaPP, OpHSLMidtones,
        OpHSLNeutralizeBackground, OpHSLRotateHue, OpHSLSaturationGamma,
        OpHSLScaleBlack, OpHSLScaleOffsetChannel, OpHSLSCNR,
        OpHSLSelectiveSaturation, OpHSLStretchIterative, OpHSLUnsharpMask,
    )
    from nightlight_tpu.pipeline.ops_stretch import (
        OpGamma, OpGammaPP, OpGaussianBlur, OpMidtones, OpNormalizeRange,
        OpScaleBlack, OpStretchIterative, OpUnsharpMask,
    )

    op_load_many = OpLoadMany(file_patterns=list(args.files))
    op_debayer = OpDebayer(channel=args.debayer, color_filter_array=args.cfa)
    op_star_detect = OpStarDetect(
        radius=args.starRadius, sigma=args.starSig, bad_pixel_sigma=args.starBpSig,
        in_out_ratio=args.starInOut,
        save=OpSave(file_pattern=args.stars, export_mode=int(ExportMode.MinMax), gamma=1))
    op_preproc = build_preprocess_seq(args, op_star_detect, op_debayer)

    cmd = args.command
    if cmd == "stats":
        return OpSequence(steps=[op_load_many, op_preproc])

    if cmd == "stack":
        import os

        from nightlight_tpu.pipeline.ops_stack import FusedPreprocessSpec

        # Fused whole-batch preprocess (models/fastpath.py): eligible when
        # the preprocess chain reduces to calibrate+badPixel+starDetect
        # [+exportStats] -- i.e. every other op in build_preprocess_seq is a
        # no-op under these args -- and no per-frame save patterns are set.
        # NIGHTLIGHT_NO_FUSED=1 forces the per-frame path for debugging.
        fused_spec = None
        if (not args.debayer and args.debandH == 0 and args.debandV == 0
                and args.binning <= 1 and args.preScale == 1 and args.preOffset == 0
                and args.backGrid == 0 and not args.pre and not args.stars
                and args.bpSigLow > 0 and args.bpSigHigh > 0
                and args.starRadius > 0 and args.starSig > 0
                and not os.environ.get("NIGHTLIGHT_NO_FUSED")):
            fused_spec = FusedPreprocessSpec(
                dark=args.dark, flat=args.flat,
                bp_sigma_low=args.bpSigLow, bp_sigma_high=args.bpSigHigh,
                star_radius=args.starRadius, star_sig=args.starSig,
                star_bp_sig=args.starBpSig, star_in_out=args.starInOut,
                export_stats=args.exportStats)

        return OpSequence(steps=[
            op_load_many,
            OpStackBatches(fused_spec=fused_spec, per_batch=OpSequence(steps=[
                op_preproc,
                OpSelectReference(target=int(SelRefTarget.Histo), mode=args.histoRef,
                                  star_detect=op_star_detect),
                OpSelectReference(target=int(SelRefTarget.Align), mode=args.alignRef,
                                  star_detect=op_star_detect),
                OpFilter(min_stars=args.minStars),
                OpMatchHistogram(mode=args.normHist),
                # defer_warp: project at the stack/save barrier with the
                # host-resolved transform (gather-free shift-blend warp);
                # valid here because OpSave and OpStack both apply
                # check_align_drop before touching frame data
                OpAlign(k=args.alignK, threshold=args.alignT,
                        oob_mode=int(OutOfBoundsMode.NaN), defer_warp=True),
                OpSave(file_pattern=args.post, export_mode=int(ExportMode.MinMax), gamma=1),
                # negative sigma = goal-seek sigma bounds from target clip
                # percentages (documented behavior of -stSigLow/-stSigHigh=-1;
                # dead code in the reference, live in ops/findsigma.py)
                OpStack(mode=args.stMode, weighting=args.stWeight,
                        sigma_low=args.stSigLow, sigma_high=args.stSigHigh),
                op_star_detect,
                OpSave(file_pattern=args.batch, export_mode=int(ExportMode.MinMax), gamma=1),
            ])),
            op_star_detect,
            OpSave(file_pattern=args.out, export_mode=int(ExportMode.MinMax), gamma=1),
            OpSave(file_pattern=args.tiff, export_mode=int(ExportMode.Zero65535), gamma=1),
            OpSave(file_pattern=args.jpg, export_mode=int(ExportMode.Zero65535), gamma=args.jpgGamma),
        ])

    if cmd == "stretch":
        return OpSequence(steps=[
            op_load_many,
            OpNormalizeRange(),
            OpStretchIterative(location=args.autoLoc / 100, scale=args.autoScale / 100),
            OpMidtones(mid=args.midtone, black=args.midBlack),
            OpGamma(gamma=args.gamma),
            OpGammaPP(gamma=args.ppGamma, sigma=args.ppSigma),
            OpScaleBlack(location=args.scaleBlack / 100),
            op_star_detect,
            OpSelectReference(target=int(SelRefTarget.Align), mode=args.alignRef,
                              star_detect=op_star_detect),
            OpAlign(k=args.alignK, threshold=args.alignT,
                    oob_mode=int(OutOfBoundsMode.OwnLocation)),
            OpGaussianBlur(sigma=args.blurSigma),
            OpUnsharpMask(sigma=args.usmSigma, gain=args.usmGain, threshold=args.usmThresh),
            OpSave(file_pattern=args.out, export_mode=int(ExportMode.MinMax), gamma=1),
            OpSave(file_pattern=args.tiff, export_mode=int(ExportMode.Zero1), gamma=1),
            OpSave(file_pattern=args.jpg, export_mode=int(ExportMode.Zero1), gamma=args.jpgGamma),
        ])

    if cmd == "rgb":
        return OpSequence(steps=[
            op_load_many,
            op_star_detect,
            OpSelectReference(target=int(SelRefTarget.Align), mode="%rgb",
                              star_detect=op_star_detect),
            OpRGBCombine(),
            OpRGBBalance(block=args.balBlock, border=args.balBorder,
                         skip_bright=args.balSkipBright, skip_dim=args.balSkipDim,
                         shadows={"R": args.balShR, "G": args.balShG, "B": args.balShB},
                         highlights={"R": args.balHiR, "G": args.balHiG, "B": args.balHiB}),
            OpRGBToHSLuv(),
            OpHSLApplyLum(),
            OpHSLUnsharpMask(sigma=args.usmSigma, gain=args.usmGain, threshold=args.usmThresh),
            OpHSLNeutralizeBackground(sigma_low=args.neutSigmaLow, sigma_high=args.neutSigmaHigh),
            OpHSLSaturationGamma(gamma=args.chromaGamma, sigma=args.chromaSigma),
            OpHSLSelectiveSaturation(from_=args.chromaFrom, to=args.chromaTo, factor=args.chromaBy),
            OpHSLRotateHue(from_=args.rotFrom, to=args.rotTo, offset=args.rotBy, sigma=args.rotSigma),
            OpHSLSCNR(factor=args.scnr),
            OpHSLStretchIterative(location=args.autoLoc / 100, scale=args.autoScale / 100),
            OpHSLMidtones(mid=args.midtone, black=args.midBlack),
            OpHSLGamma(gamma=args.gamma),
            OpHSLGammaPP(gamma=args.ppGamma, sigma=args.ppSigma),
            OpHSLScaleOffsetChannel(channel_id=2, scale=args.lumScale, offset=args.lumOffset),
            OpHSLScaleBlack(location=args.scaleBlack / 100),
            OpHSLuvToRGB(),
            OpSave(file_pattern=args.out, export_mode=int(ExportMode.MinMax), gamma=1),
            OpSave(file_pattern=args.tiff, export_mode=int(ExportMode.Zero1), gamma=1),
            OpSave(file_pattern=args.jpg, export_mode=int(ExportMode.Zero1), gamma=args.jpgGamma),
        ])

    raise ValueError(f"Unknown command '{cmd}'")


