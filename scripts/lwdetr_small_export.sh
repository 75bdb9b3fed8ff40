#!/bin/bash
# Export LW-DETR-small as a serialized StableHLO deployment artifact
python main.py --preset small --output_dir output/lwdetr_small_export \
    export_model --shape 640 640
