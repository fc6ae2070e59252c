"""Corpus datasets driven by CSV partition tables + speaker maps.

Parity target: `/root/reference/corpus/vctk.py` (and the upstream-unreachable
`corpus/ljspeech.py`): select rows by split, build ``path/speaker/id.wav``
file paths, map speaker names to ints via a JSON map, sort by duration
descending, drop the 'lj' speaker from the test split, optional bucketing
(batch of similar-duration items as one logical item).
"""

from __future__ import annotations

import json
from os.path import join

import pandas as pd


class VCTKDataset:
    """Rows: (file_path, speaker_id). `corpus/vctk.py:9-52`."""

    def __init__(self, path, partition_table, split, bucketing, batch_size, spkr_map):
        self.path = path
        self.split = split
        self.batch_size = batch_size
        self.bucketing = bucketing and (split not in ["dev", "test"])
        self.bs_for_collate = 1 if self.bucketing else batch_size
        self.spkr_map = json.load(open(spkr_map))
        table = pd.read_csv(partition_table, index_col=0)
        table = table[table.split == split]
        if len(table) == 0:
            self.table = pd.DataFrame(
                [{"speaker": 0, "split": split, "duration": 0}])
        else:
            table = table.copy()
            table["file_path"] = [join(path, spk, fid + ".wav")
                                  for fid, spk in zip(table.index, table.speaker)]
            table["speaker"] = [self.spkr_map[s] for s in table.speaker]
            table = table.sort_values("duration", axis=0, ascending=False)
            if split == "test" and "lj" in self.spkr_map:
                table = table[table.speaker != self.spkr_map["lj"]]
            self.table = table
        self.n_spkr = len(self.spkr_map)

    def get_statics(self):
        return "           | {} size = {}\t| Duration = {:.1f}\t| Bucketing = {} ".format(
            self.split.replace("unpaired", "unpair"), len(self.table),
            self.table.duration.sum() / 60, self.bucketing)

    def __getitem__(self, index):
        if self.bucketing:
            index = min(len(self.table) - self.batch_size, index)
            rows = self.table.iloc[index : index + self.batch_size]
            return list(zip(rows.file_path.tolist(), rows.speaker.tolist()))
        row = self.table.iloc[index]
        return row.file_path, row.speaker

    def __len__(self):
        return len(self.table)


class LJSpeechDataset(VCTKDataset):
    """LJSpeech layout: wavs live flat under ``path/wavs`` and every row is
    the single 'lj' speaker. (Upstream `corpus/ljspeech.py` is unreachable —
    `src/data.py:88-91` only dispatches 'vctk'; provided for capability
    parity.)"""

    def __init__(self, path, partition_table, split, bucketing, batch_size, spkr_map):
        super().__init__(path, partition_table, split, bucketing, batch_size, spkr_map)
        if len(self.table) and "file_path" in self.table:
            self.table = self.table.copy()
            self.table["file_path"] = [join(path, "wavs", fid + ".wav") for fid in self.table.index]


def create_dataset(name, path, bucketing, batch_size, spkr_map, partition_table,
                   inference_stage, **kwargs):
    """4-way split factory (`src/data.py:82-109`)."""
    if name.lower() == "vctk":
        Dataset = VCTKDataset
    elif name.lower() == "ljspeech":
        Dataset = LJSpeechDataset
    else:
        raise NotImplementedError(name)

    msg = [f"Data spec. | Corpus = {name} (from {path})\t| Batch size = {batch_size}"]
    pair_set = Dataset(path, partition_table, "paired", bucketing, batch_size, spkr_map)
    unpair_set = Dataset(path, partition_table, "unpaired", bucketing, batch_size, spkr_map)
    dev_set = Dataset(path, partition_table, "dev", bucketing, batch_size, spkr_map)
    test_set = None
    if inference_stage:
        test_set = Dataset(path, partition_table, "test", bucketing, batch_size, spkr_map)
        msg.append(test_set.get_statics())
    else:
        msg.extend([pair_set.get_statics(), unpair_set.get_statics(), dev_set.get_statics()])
    return unpair_set, pair_set, dev_set, test_set, msg
