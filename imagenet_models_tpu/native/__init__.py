"""Native (C++) host-pipeline sources.

`imtpu_loader.cpp` is the threaded libjpeg decode+RandomResizedCrop+resize
pipeline (the TPU-native analog of the reference's DataLoader worker pool +
timm prefetcher, SURVEY.md §2.2). It is compiled lazily on first use by
`imagenet_models_tpu.data.native` via the Makefile in this directory and
loaded through ctypes; when no toolchain or libjpeg is available the data
pipeline falls back to PIL transparently.
"""
