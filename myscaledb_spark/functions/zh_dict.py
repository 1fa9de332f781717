"""Vendored Chinese word dictionary for forward-maximum-matching tokenization.

A small, pinned vocabulary of common general + technical Mandarin words
(2-4 chars). The reference ships tantivy's `chinese` tokenizer
(`src/Storages/MergeTree/MergeTreeIndexTantivy.cpp:710-751`); jieba is not in
this container, so we vendor a deterministic dictionary and segment with
forward maximum matching (FMM) — longest dictionary word wins, unmatched CJK
chars fall back to single-char tokens. The list is intentionally small and
frozen so tokenization is reproducible across versions.
"""

from __future__ import annotations

ZH_WORDS: frozenset[str] = frozenset(
    """
    数据 引擎 查询 搜索 向量 表格 哈希 快速 缓慢 系统 分析 计算 存储 索引
    文本 语言 模型 学习 机器 智能 网络 客户 用户 时间 空间 程序 代码 算法
    函数 变量 内存 磁盘 文件 目录 进程 线程 任务 队列 消息 日志 错误 警告
    信息 状态 结果 问题 方法 方案 设计 实现 测试 部署 运行 开发 工程 项目
    管理 操作 处理 执行 优化 性能 效率 质量 安全 稳定 可靠 扩展 分布 集群
    节点 副本 分区 分片 合并 排序 过滤 聚合 连接 关联 统计 汇总 平均 最大
    最小 总和 计数 去重 采样 压缩 编码 解码 加密 解密 扫描 键值 批量 流式
    窗口 列式 数值 分组 分词 检索 匹配 召回 精度 维度 距离 相似 近似 精确
    中国 北京 上海 我们 你们 他们 这个 那个 什么 怎么 因为 所以 但是 如果
    虽然 已经 正在 将要 可以 应该 需要 必须 能够 没有 不是 就是 还是 或者
    而且 并且 今天 明天 昨天 现在 以后 以前 时候 地方 东西 事情 工作 生活
    世界 国家 城市 公司 学校 老师 学生 朋友 孩子 大家 非常 特别 重要 主要
    数据库 服务器 计算机 互联网 为什么 分布式 实时性 分词器
    人工智能 机器学习 深度学习 操作系统 自然语言
    """.split()
)

ZH_MAX_LEN: int = max(len(w) for w in ZH_WORDS)
