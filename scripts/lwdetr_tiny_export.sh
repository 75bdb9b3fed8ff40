#!/bin/bash
# Export LW-DETR-tiny as a serialized StableHLO deployment artifact
python main.py --preset tiny --output_dir output/lwdetr_tiny_export \
    export_model --shape 640 640
