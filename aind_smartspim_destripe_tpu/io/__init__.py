"""Host-side IO: blosc codec, Zarr v2 store, OME-NGFF metadata, image files."""
