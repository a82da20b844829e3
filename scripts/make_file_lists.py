"""Generate Cityscapes file lists from a dataset checkout.

The shipped lists (fasterseg_tpu/data/lists/) are the standard Cityscapes
index files — "img_path gt_path" lines, lexicographically sorted, the same
canonical enumeration the reference ships (tools/datasets/cityscapes/).
This script regenerates them from a user's own dataset directory, so a
fresh Cityscapes download works without any shipped data:

  python scripts/make_file_lists.py --data-root /path/to/cityscapes

Expects the official layout:
  leftImg8bit/{train,val,test}/<city>/*_leftImg8bit.png
  gtFine/{train,val,test}/<city>/*_gtFine_labelTrainIds.png
(labelTrainIds come from cityscapesscripts' createTrainIdLabelImgs.py)
"""

import argparse
import os


def enumerate_split(data_root: str, split: str):
    img_dir = os.path.join(data_root, "leftImg8bit", split)
    pairs = []
    for dirpath, _, files in sorted(os.walk(img_dir)):
        for fn in sorted(files):
            if not fn.endswith("_leftImg8bit.png"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fn), data_root)
            gt = rel.replace("leftImg8bit", "gtFine", 1).replace(
                "_leftImg8bit.png", "_gtFine_labelTrainIds.png")
            pairs.append(f"{rel} {gt}")
    return sorted(pairs)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", required=True)
    p.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(__file__), "..", "fasterseg_tpu", "data", "lists"))
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    lists = {}
    for split, name in (("train", "cityscapes_train_fine.txt"),
                        ("val", "cityscapes_val_fine.txt"),
                        ("test", "cityscapes_test.txt")):
        lines = enumerate_split(args.data_root, split)
        lists[split] = lines
        path = os.path.join(args.out_dir, name)
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"{path}: {len(lines)} entries")

    path = os.path.join(args.out_dir, "cityscapes_train_val_fine.txt")
    with open(path, "w") as f:
        f.write("\n".join(lists["train"] + lists["val"]) + "\n")
    print(f"{path}: {len(lists['train']) + len(lists['val'])} entries")


if __name__ == "__main__":
    main()
