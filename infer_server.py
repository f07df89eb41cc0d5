"""ASR REST + WebSocket server (parity: reference infer_server.py)."""
import argparse
import functools

from masr_tpu.infer.predictor import MASRPredictor
from masr_tpu.infer.server import ASRServer
from masr_tpu.utils.config import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('host',            str,  '0.0.0.0',  "监听主机的IP地址")
add_arg('port',            int,  5000,       "REST服务所使用的端口号")
add_arg('ws_port',         int,  5001,       "WebSocket流式识别端口号")
add_arg('model_dir',       str,  'models/conformer_streaming_fbank/inference_model/', "导出的预测模型文件夹路径")
add_arg("use_gpu",         bool, True,   "是否使用加速器预测(兼容参数)")
add_arg('use_pun',         bool, False,  "是否给识别结果加标点符号")
add_arg('is_itn',          bool, False,  "是否对文本进行反标准化")
add_arg('decoder',         str,  'ctc_greedy', "解码器: ctc_greedy | ctc_beam_search | attention_rescoring | ctc_beam_search_device")
add_arg('pun_model_dir',   str,  None,   "标点符号的模型文件夹路径")
add_arg('max_streams',     int,  0,      "并发流式识别路数(>1 时用批量引擎，一次编译步进所有流)")
add_arg('tick_chunks',     int,  1,      "批量引擎每次派发合并的块数(k>1 吞吐模式：缓存/权重DMA摊薄k倍，首包延迟增加(k-1)*0.64s)")
add_arg('pos_table_len',   int,  8192,   "批量引擎位置表行数(约 len*40ms 流长后切换到精确位置程序，无精度损失；按会话时长设置)")
args = parser.parse_args()
print_arguments(args=args)

predictor = MASRPredictor(model_dir=args.model_dir, decoder=args.decoder,
                          use_pun=args.use_pun,
                          pun_model_dir=args.pun_model_dir)

server = ASRServer(predictor, host=args.host, port=args.port,
                   ws_port=args.ws_port, use_pun=args.use_pun,
                   is_itn=args.is_itn, max_streams=args.max_streams,
                   tick_chunks=args.tick_chunks,
                   pos_table_len=args.pos_table_len)
server.start(block=True)
